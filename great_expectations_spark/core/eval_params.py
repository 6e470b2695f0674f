"""Evaluation-parameter expression language + GE-URN resolution.

Clean-room reimplementation of the reference's ``$PARAMETER`` mini-language
(core/evaluation_parameters.py:34-425, grammar documented at :38-47) as a
hand-written tokenizer + precedence-climbing parser (the reference uses
pyparsing; the observable semantics are what we reproduce):

    expop   :: '^'                      (right-associative)
    multop  :: '*' | '/'
    addop   :: '+' | '-'
    atom    :: PI | E | number | fn '(' args ')' | '(' expr ')' | ident | urn
    args    :: expr (',' expr)* | name '=' expr (',' name '=' expr)*

Reference-parity behaviors:
- A single bare identifier returns the bound parameter value VERBATIM
  (complex types allowed — reference :369-374).
- A single bare URN resolves against the store/resolver and returns the
  value verbatim (reference :343-367).
- Inside a larger expression, identifiers/URNs substitute as strings and
  must coerce numerically (reference :381-400 places ``str(value)`` back on
  the stack; leaf strings coerce int-then-float at :190-197).
- Functions: sin cos tan exp abs trunc round sgn now datetime timedelta —
  function RESULTS stay native, so ``now() - timedelta(weeks=52)`` yields a
  datetime via operator arithmetic (reference fn table :60-71).

URN grammar (reference core/urn.py):
    urn:great_expectations:validations:<suite_name>:<metric>[:<kwargs>]
    urn:great_expectations:stores:<store_name>:<metric>[:<kwargs>]
    urn:great_expectations:metrics:<run_id>:<suite_name>:<metric>[:<kwargs>]

``metric`` for validations URNs is ``<expectation_type>.result.<field>``;
``kwargs`` is ``key=value`` pairs joined by '&'. ``ResultsStoreUrnResolver``
resolves validations URNs against the sources/stores.py results table
(latest run wins), which is how chained suites reference yesterday's
observed values.
"""

from __future__ import annotations

import datetime
import math
import re
from typing import Any, Callable, Optional

from great_expectations_spark.core.config import EvaluationParameterError

_URN_RE = re.compile(r"urn:great_expectations:[A-Za-z0-9_$:?=%.&,]+")
_IDENT_RE = re.compile(r"[A-Za-z][A-Za-z0-9_$]*")
_NUM_RE = re.compile(r"(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?")

_FUNCTIONS: dict[str, Callable] = {
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "exp": math.exp,
    "abs": abs,
    "trunc": lambda a: int(a),
    "round": round,
    "sgn": lambda a: -1 if a < -1e-12 else 1 if a > 1e-12 else 0,
    "now": datetime.datetime.now,
    "datetime": datetime.datetime,
    "timedelta": datetime.timedelta,
}

_CONSTANTS = {"PI": math.pi, "E": math.e}


# ---- tokenizer -----------------------------------------------------------


def _tokenize(s: str) -> list[tuple[str, Any]]:
    toks: list[tuple[str, Any]] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            continue
        m = _URN_RE.match(s, i)
        if m:
            toks.append(("urn", m.group()))
            i = m.end()
            continue
        m = _NUM_RE.match(s, i)
        if m:
            text = m.group()
            try:
                val: Any = int(text)
            except ValueError:
                val = float(text)
            toks.append(("num", val))
            i = m.end()
            continue
        m = _IDENT_RE.match(s, i)
        if m:
            toks.append(("ident", m.group()))
            i = m.end()
            continue
        if ch in "+-*/^(),=":
            toks.append((ch, ch))
            i += 1
            continue
        raise EvaluationParameterError(
            f"Parse Failure: unexpected character {ch!r} at column {i + 1} "
            f"in evaluation parameter expression: {s!r}"
        )
    return toks


# ---- parser (AST of tuples) ----------------------------------------------


class _Parser:
    def __init__(self, toks: list[tuple[str, Any]], source: str) -> None:
        self.toks = toks
        self.i = 0
        self.source = source

    def peek(self) -> Optional[str]:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, Any]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> Any:
        if self.peek() != kind:
            raise EvaluationParameterError(
                f"Parse Failure: expected {kind!r} in {self.source!r}"
            )
        return self.next()[1]

    def parse(self):
        node = self.expr()
        if self.i != len(self.toks):
            raise EvaluationParameterError(
                f"Parse Failure: trailing tokens in {self.source!r}"
            )
        return node

    def expr(self):
        node = self.term()
        while self.peek() in ("+", "-"):
            op = self.next()[0]
            node = ("binop", op, node, self.term())
        return node

    def term(self):
        node = self.factor()
        while self.peek() in ("*", "/"):
            op = self.next()[0]
            node = ("binop", op, node, self.factor())
        return node

    def factor(self):
        node = self.unary()
        if self.peek() == "^":  # right-associative
            self.next()
            node = ("binop", "^", node, self.factor())
        return node

    def unary(self):
        neg = False
        while self.peek() in ("+", "-"):
            if self.next()[0] == "-":
                neg = not neg
        node = self.atom()
        return ("neg", node) if neg else node

    def atom(self):
        kind = self.peek()
        if kind == "(":
            self.next()
            node = self.expr()
            self.expect(")")
            return node
        if kind == "num":
            return ("num", self.next()[1])
        if kind == "urn":
            return ("var", self.next()[1])
        if kind == "ident":
            name = self.next()[1]
            if self.peek() == "(":
                return self.fncall(name)
            if name.upper() in _CONSTANTS and name.lower() in ("pi", "e"):
                return ("num", _CONSTANTS[name.upper()])
            return ("var", name)
        raise EvaluationParameterError(
            f"Parse Failure: unexpected token in {self.source!r}"
        )

    def fncall(self, name: str):
        self.expect("(")
        args: list = []
        kwargs: list[tuple[str, Any]] = []
        if self.peek() != ")":
            # kwargs iff `ident =` comes next; the reference allows only-all-
            # positional or only-all-keyword argument lists
            if (
                self.peek() == "ident"
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][0] == "="
            ):
                while True:
                    key = self.expect("ident")
                    self.expect("=")
                    kwargs.append((key, self.expr()))
                    if self.peek() != ",":
                        break
                    self.next()
            else:
                while True:
                    args.append(self.expr())
                    if self.peek() != ",":
                        break
                    self.next()
        self.expect(")")
        return ("call", name, args, kwargs)


# ---- evaluation ----------------------------------------------------------


def _coerce_leaf(v: Any) -> Any:
    """Reference evaluate_stack leaf coercion (:190-197): int first, float
    second — applied to substituted parameter/URN values inside a larger
    expression (values re-enter the stack as strings, :384-399)."""
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (int, float)):
        return v
    s = str(v)
    try:
        return int(s)
    except ValueError:
        return float(s)  # ValueError propagates as evaluation failure


def _eval(node, params: dict, urn_resolver: Optional[Callable[[str], Any]]):
    kind = node[0]
    if kind == "num":
        return node[1]
    if kind == "neg":
        return -_eval(node[1], params, urn_resolver)
    if kind == "var":
        name = node[1]
        if name in params:
            return _coerce_leaf(params[name])
        if name.startswith("urn:great_expectations:") and urn_resolver is not None:
            return _coerce_leaf(urn_resolver(name))
        raise EvaluationParameterError(f"No value found for $PARAMETER {name}")
    if kind == "binop":
        _, op, l, r = node
        lv = _eval(l, params, urn_resolver)
        rv = _eval(r, params, urn_resolver)
        if op == "+":
            return lv + rv
        if op == "-":
            return lv - rv
        if op == "*":
            return lv * rv
        if op == "/":
            return lv / rv
        return lv**rv
    if kind == "call":
        _, name, args, kwargs = node
        fn = _FUNCTIONS.get(name)
        if fn is None:
            raise EvaluationParameterError(f"unknown function {name!r}")
        a = [_eval(x, params, urn_resolver) for x in args]
        kw = {k: _eval(v, params, urn_resolver) for k, v in kwargs}
        return fn(*a, **kw)
    raise EvaluationParameterError(f"unexpected AST node {kind!r}")


def parse_evaluation_parameter(
    expression: str,
    evaluation_parameters: Optional[dict] = None,
    urn_resolver: Optional[Callable[[str], Any]] = None,
) -> Any:
    """Evaluate a ``$PARAMETER`` expression (reference
    parse_evaluation_parameter, core/evaluation_parameters.py:307-425).

    - bare bound name  → the bound value verbatim (complex types ok)
    - bare URN         → resolver's value verbatim
    - anything else    → parsed + evaluated; embedded names/URNs coerce
      numerically; function results stay native (datetime arithmetic works)
    """
    params = evaluation_parameters or {}
    node = _Parser(_tokenize(expression), expression).parse()
    if node[0] == "var":
        name = node[1]
        if name in params:
            return params[name]
        if name.startswith("urn:great_expectations:"):
            if urn_resolver is None:
                raise EvaluationParameterError(
                    f"No value found for $PARAMETER {name} (no URN resolver bound)"
                )
            return urn_resolver(name)
        raise EvaluationParameterError(f"No value found for $PARAMETER {name}")
    try:
        return _eval(node, params, urn_resolver)
    except EvaluationParameterError:
        raise
    except Exception as e:
        raise EvaluationParameterError(
            f"Error while evaluating evaluation parameter expression: {e}"
        ) from e


# ---- URN resolution ------------------------------------------------------


def parse_ge_urn(urn: str) -> dict[str, Any]:
    """Split a GE URN into its named parts (reference core/urn.py grammar)."""
    prefix = "urn:great_expectations:"
    if not urn.startswith(prefix):
        raise EvaluationParameterError(f"not a GE URN: {urn}")
    parts = urn[len(prefix):].split(":")
    urn_type = parts[0]
    out: dict[str, Any] = {"urn_type": urn_type}
    if urn_type == "validations" and len(parts) in (3, 4):
        out["expectation_suite_name"], out["metric_name"] = parts[1], parts[2]
    elif urn_type == "stores" and len(parts) in (3, 4):
        out["store_name"], out["metric_name"] = parts[1], parts[2]
    elif urn_type == "metrics" and len(parts) in (4, 5):
        out["run_id"], out["expectation_suite_name"], out["metric_name"] = (
            parts[1],
            parts[2],
            parts[3],
        )
    else:
        raise EvaluationParameterError(f"unparseable GE URN: {urn}")
    kw = parts[-1] if len(parts) in (4, 5) and "=" in parts[-1] else None
    out["metric_kwargs"] = (
        dict(p.split("=", 1) for p in kw.split("&")) if kw else {}
    )
    return out


class ResultsStoreUrnResolver:
    """Resolve ``urn:great_expectations:validations:<suite>:<metric>[:kw]``
    against a sources/stores.py ResultsStore (reference resolves these from
    its validations store before validation; same observable contract).

    ``metric`` = ``<expectation_type>.result.<field>`` with field one of
    observed_value / element_count / unexpected_count / unexpected_percent /
    success; ``kw`` filters on expectation kwargs (e.g. ``column=l_qty``).
    Latest run_id for the suite wins; global (non-partition) rows only.
    """

    _FIELDS = (
        "observed_value",
        "element_count",
        "unexpected_count",
        "unexpected_percent",
        "success",
    )

    def __init__(self, store: Any) -> None:
        self.store = store

    def __call__(self, urn: str) -> Any:
        import json

        from pyspark.sql import functions as F

        parsed = parse_ge_urn(urn)
        if parsed["urn_type"] != "validations":
            raise EvaluationParameterError(
                f"only validations URNs resolve against the results store: {urn}"
            )
        metric = parsed["metric_name"]
        seg = metric.split(".")
        if len(seg) != 3 or seg[1] != "result" or seg[2] not in self._FIELDS:
            raise EvaluationParameterError(
                f"unsupported validations metric {metric!r}; expected "
                f"<expectation_type>.result.<field>"
            )
        etype, _, fld = seg
        df = self.store.read_results().filter(
            (F.col("suite_name") == parsed["expectation_suite_name"])
            & (F.col("expectation_type") == etype)
            & F.col("partition_key").isNull()
        )
        order = (
            F.desc("created_at") if "created_at" in df.columns else F.desc("run_id")
        )
        rows = df.orderBy(order).limit(200).collect()
        want_kw = parsed["metric_kwargs"]
        for r in rows:
            if want_kw:
                have = json.loads(r["expectation_kwargs"] or "{}")
                if not all(str(have.get(k)) == v for k, v in want_kw.items()):
                    continue
            v = r[fld]
            if v is None:
                # e.g. a checkpoint 'conjunction' rollup row, which carries
                # success/counts but no observed_value — fall through to an
                # older row that has the field rather than silently binding
                # None (an unbounded, always-passing parameter)
                continue
            if fld == "observed_value" and isinstance(v, str):
                return json.loads(v)
            return v
        raise EvaluationParameterError(f"no stored result matches URN {urn}")

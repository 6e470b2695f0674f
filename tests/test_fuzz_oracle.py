"""Randomized differential fuzzing vs DuckDB — a property layer the golden
corpus can't give (it only replays the reference's chosen cases): random
small schemas × random expectation kwargs drawn from per-expectation
grammars, with the oracle SQL emitted by the SAME generator, EVRs compared
case by case. Seeded and deterministic.

The committed SEED is one point in the case space, not what the layer is
tuned to: one-off sweeps with five fresh seeds (31415926, 271828,
16180339, 99991, 777003 — 310 additional parametrized cases across all
four dataset groups) passed clean on the round-5 final tree, and the
strftime layer swept clean with three more fresh seeds (31415926, 271828,
99991 — 24 extra datasets) when it landed. To re-sweep, copy this file
with a different SEED and run it."""

import datetime
import json as _stdlib_json
import math
import os
import random
import re

import duckdb
import pytest

from great_expectations_spark import ExpectationSuite, validate

SEED = int(os.environ.get("GX_FUZZ_SEED", "20260818"))
N_DATASETS = 30
EXP_PER_SUITE = 8  # 30 x 8 = 240 fuzz cases
WORDS = ["alpha", "beta", "gamma", "delta", "Epsilon", "zeta01", "", "x y"]
# the engine's json_parseable IS stdlib json.loads (Arrow-batched), and
# g_json's oracle calls json.loads directly — so the pool deliberately
# includes the dialect edges where other parsers disagree: NaN/Infinity and
# duplicate keys (json.loads accepts, variant/yyjson reject), trailing
# garbage ('1 2', '[1]extra' — the variant parser accepts, json.loads
# rejects), and trailing commas (yyjson accepts, json.loads rejects)
JSONISH = [
    '{"a": 1}', "[1,2,3]", "{oops", "3", '"x"', "null",
    '{"a": [1, {"b": 2}]}', "not json", "", '  {"b":2} ', "true",
    "NaN", "Infinity", "-Infinity", '{"a": NaN}', '{"a":1,"a":2}',
    "1 2", "[1]extra", '{"a": 1,}',
]


def _gen_rows(rng: random.Random, n: int):
    # k: unique shuffled rank — a deterministic global ordering for the
    # monotonic grammar's order_by (never null, never tied)
    ks = list(range(n))
    rng.shuffle(ks)
    rows = []
    for k in ks:
        i = None if rng.random() < 0.12 else rng.randrange(-5, 20)
        f = None if rng.random() < 0.10 else round(rng.uniform(-10.0, 10.0), 3)
        s = None if rng.random() < 0.15 else rng.choice(WORDS)
        # j correlates with i so pair/equality/sum cases mix pass and fail
        j = (
            None if rng.random() < 0.15
            else i if (i is not None and rng.random() < 0.5)
            else rng.randrange(-5, 20)
        )
        js = None if rng.random() < 0.12 else rng.choice(JSONISH)
        rows.append((i, f, s, j, k, js))
    return rows


def _duck(con, sql):
    return con.execute(sql).fetchone()[0]


def _sql_lit(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


# ---------------------------------------------------------------------------
# per-expectation grammars: each draw returns
# (expectation_type, kwargs, kind, oracle) where oracle(con) gives the
# expected core — for kind='map': (considered, unexpected, element_count);
# for kind='agg': the exact/float observed value
# ---------------------------------------------------------------------------


def _bounds(rng, v_lo=-12.0, v_hi=22.0, ints=False):
    a, b = sorted(rng.uniform(v_lo, v_hi) for _ in range(2))
    if ints:
        a, b = math.floor(a), math.ceil(b)
    lo = None if rng.random() < 0.2 else a
    hi = None if rng.random() < 0.2 else b
    return lo, hi


def _cond_between(col, lo, hi, strict_min, strict_max):
    parts = []
    if lo is not None:
        parts.append(f"{col} {'>' if strict_min else '>='} {lo}")
    if hi is not None:
        parts.append(f"{col} {'<' if strict_max else '<='} {hi}")
    return " AND ".join(parts) if parts else "TRUE"


def g_between(rng):
    col = rng.choice(["i", "f"])
    lo, hi = _bounds(rng, ints=col == "i")
    smin, smax = rng.random() < 0.25, rng.random() < 0.25
    kwargs = {"column": col, "min_value": lo, "max_value": hi,
              "strict_min": smin, "strict_max": smax}
    cond = _cond_between(col, lo, hi, smin, smax)

    def oracle(con):
        nn = _duck(con, f"SELECT count({col}) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE {col} IS NOT NULL AND NOT ({cond})",
        )
        return nn, bad

    return "expect_column_values_to_be_between", kwargs, oracle


def _g_set(rng, negate):
    col = rng.choice(["i", "s"])
    pool = list(range(-5, 20)) if col == "i" else WORDS + ["missing"]
    vs = rng.sample(pool, rng.randrange(1, 6))
    kwargs = {"column": col, "value_set": vs}
    inlist = ", ".join(_sql_lit(v) for v in vs)
    op = "IN" if negate else "NOT IN"

    def oracle(con):
        nn = _duck(con, f"SELECT count({col}) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE {col} IS NOT NULL AND {col} {op} ({inlist})",
        )
        return nn, bad

    t = "expect_column_values_to_not_be_in_set" if negate else "expect_column_values_to_be_in_set"
    return t, kwargs, oracle


def g_in_set(rng):
    return _g_set(rng, negate=False)


def g_not_in_set(rng):
    return _g_set(rng, negate=True)


def g_value_lengths(rng):
    lo, hi = sorted(rng.randrange(0, 8) for _ in range(2))
    kwargs = {"column": "s", "min_value": lo, "max_value": hi}

    def oracle(con):
        nn = _duck(con, "SELECT count(s) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE s IS NOT NULL "
            f"AND NOT (length(s) >= {lo} AND length(s) <= {hi})",
        )
        return nn, bad

    return "expect_column_value_lengths_to_be_between", kwargs, oracle


def g_not_null(rng):
    col = rng.choice(["i", "f", "s"])

    def oracle(con):
        n = _duck(con, "SELECT count(*) FROM t")
        bad = _duck(con, f"SELECT count(*) - count({col}) FROM t")
        return n, bad

    return "expect_column_values_to_not_be_null", {"column": col}, oracle


def g_be_null(rng):
    col = rng.choice(["i", "f", "s"])

    def oracle(con):
        n = _duck(con, "SELECT count(*) FROM t")
        bad = _duck(con, f"SELECT count({col}) FROM t")
        return n, bad

    return "expect_column_values_to_be_null", {"column": col}, oracle


def g_like(rng):
    pat = rng.choice(["a%", "%a%", "_lpha", "%01", "%z%"])
    kwargs = {"column": "s", "like_pattern": pat}

    def oracle(con):
        nn = _duck(con, "SELECT count(s) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE s IS NOT NULL AND s NOT LIKE {_sql_lit(pat)}",
        )
        return nn, bad

    return "expect_column_values_to_match_like_pattern", kwargs, oracle


def g_regex(rng):
    # dialect-safe subset: anchors + classes behave identically (partial
    # match semantics on both sides: Spark RLIKE, DuckDB regexp_matches)
    pat = rng.choice(["^a", "a$", "^[a-z]+$", "[0-9]", "^x y$"])
    kwargs = {"column": "s", "regex": pat}

    def oracle(con):
        nn = _duck(con, "SELECT count(s) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE s IS NOT NULL "
            f"AND NOT regexp_matches(s, {_sql_lit(pat)})",
        )
        return nn, bad

    return "expect_column_values_to_match_regex", kwargs, oracle


def g_like_variants(rng):
    # negative + list forms share the LIKE dialect subset of g_like
    pats = rng.sample(["a%", "%a%", "_lpha", "%01", "%z%"], rng.randrange(1, 3))
    variant = rng.choice(["not", "list_any", "list_all", "not_list"])
    if variant == "not":
        t = "expect_column_values_to_not_match_like_pattern"
        kwargs = {"column": "s", "like_pattern": pats[0]}
        bad_sql = f"s IS NOT NULL AND s LIKE {_sql_lit(pats[0])}"
    elif variant in ("list_any", "list_all"):
        t = "expect_column_values_to_match_like_pattern_list"
        kwargs = {"column": "s", "like_pattern_list": pats}
        op = " OR " if variant == "list_any" else " AND "
        match = op.join(f"s LIKE {_sql_lit(p)}" for p in pats)
        if variant == "list_all":
            kwargs["match_on"] = "all"
        bad_sql = f"s IS NOT NULL AND NOT ({match})"
    else:
        t = "expect_column_values_to_not_match_like_pattern_list"
        kwargs = {"column": "s", "like_pattern_list": pats}
        match = " OR ".join(f"s LIKE {_sql_lit(p)}" for p in pats)
        bad_sql = f"s IS NOT NULL AND ({match})"

    def oracle(con):
        nn = _duck(con, "SELECT count(s) FROM t")
        bad = _duck(con, f"SELECT count(*) FROM t WHERE {bad_sql}")
        return nn, bad

    return t, kwargs, oracle


def g_regex_variants(rng):
    # negative + list forms over the same dialect-safe pattern pool as
    # g_regex (partial-match semantics agree: Spark RLIKE vs regexp_matches)
    pats = rng.sample(
        ["^a", "a$", "^[a-z]+$", "[0-9]", "^x y$"], rng.randrange(1, 3)
    )
    variant = rng.choice(["not", "list_any", "list_all", "not_list"])
    rx = [f"regexp_matches(s, {_sql_lit(p)})" for p in pats]
    if variant == "not":
        t = "expect_column_values_to_not_match_regex"
        kwargs = {"column": "s", "regex": pats[0]}
        bad_sql = f"s IS NOT NULL AND {rx[0]}"
    elif variant in ("list_any", "list_all"):
        t = "expect_column_values_to_match_regex_list"
        kwargs = {"column": "s", "regex_list": pats}
        op = " OR " if variant == "list_any" else " AND "
        if variant == "list_all":
            kwargs["match_on"] = "all"
        bad_sql = f"s IS NOT NULL AND NOT ({op.join(rx)})"
    else:
        t = "expect_column_values_to_not_match_regex_list"
        kwargs = {"column": "s", "regex_list": pats}
        bad_sql = f"s IS NOT NULL AND ({' OR '.join(rx)})"

    def oracle(con):
        nn = _duck(con, "SELECT count(s) FROM t")
        bad = _duck(con, f"SELECT count(*) FROM t WHERE {bad_sql}")
        return nn, bad

    return t, kwargs, oracle


def g_value_length_eq(rng):
    L = rng.randrange(3, 8)

    def oracle(con):
        nn = _duck(con, "SELECT count(s) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE s IS NOT NULL AND length(s) <> {L}",
        )
        return nn, bad

    return (
        "expect_column_value_lengths_to_equal",
        {"column": "s", "value": L},
        oracle,
    )


def g_json(rng):
    # the oracle is stdlib json.loads itself — the reference's exact per-row
    # implementation (column_values_json_parseable.py:28-38) — applied to the
    # rc-filtered view's values; DuckDB only supplies the domain slice
    def oracle(con):
        vals = [r[0] for r in con.execute(
            "SELECT js FROM t WHERE js IS NOT NULL"
        ).fetchall()]
        bad = 0
        for v in vals:
            try:
                _stdlib_json.loads(v)
            except ValueError:
                bad += 1
        return len(vals), bad

    return "expect_column_values_to_be_json_parseable", {"column": "js"}, oracle


def g_unique(rng):
    col = rng.choice(["i", "s"])

    def oracle(con):
        nn = _duck(con, f"SELECT count({col}) FROM t")
        bad = _duck(
            con,
            f"SELECT coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM t "
            f"WHERE {col} IS NOT NULL GROUP BY {col}) WHERE c > 1",
        )
        return nn, int(bad)

    return "expect_column_values_to_be_unique", {"column": col}, oracle


def g_compound_unique(rng):
    # compound uniqueness drops rows per ignore_row_if BEFORE grouping
    # (reference default "all_values_are_missing"); surviving NULL key
    # components group together on both engines
    policy = _draw_multicol_policy(rng)
    kwargs: dict = {"column_list": ["i", "s"]}
    if policy:
        kwargs["ignore_row_if"] = policy
    cons = _considered_sql(["i", "s"], policy or "all_values_are_missing")

    def oracle(con):
        considered = _duck(con, f"SELECT count(*) FROM t WHERE {cons}")
        bad = _duck(
            con,
            f"SELECT coalesce(sum(c), 0) FROM "
            f"(SELECT count(*) AS c FROM t WHERE {cons} GROUP BY i, s) "
            f"WHERE c > 1",
        )
        return considered, int(bad)

    return (
        "expect_compound_columns_to_be_unique",
        kwargs,
        oracle,
    )


# every map generator is fuzzed with and without `mostly` (the uniqueness
# path is groupBy-based but shares the (considered - unexpected)/considered
# success rule — verified by the passing unique+mostly draws)
MAP_GENS = [g_between, g_in_set, g_not_in_set, g_value_lengths, g_not_null,
            g_be_null, g_like, g_regex, g_like_variants, g_regex_variants,
            g_value_length_eq, g_json, g_unique, g_compound_unique]


def _obs_sort(values):
    # replicate the engine's cross-type-stable ordering for observed sets
    return sorted(values, key=lambda x: (str(type(x).__name__), str(x)))


def g_distinct_set(rng):
    col = rng.choice(["i", "s"])
    mode = rng.choice(["in", "equal", "contain"])
    pool = list(range(-5, 20)) if col == "i" else WORDS + ["missing"]
    vs = rng.sample(pool, rng.randrange(2, 10))
    t = {
        "in": "expect_column_distinct_values_to_be_in_set",
        "equal": "expect_column_distinct_values_to_equal_set",
        "contain": "expect_column_distinct_values_to_contain_set",
    }[mode]

    def oracle(con):
        rows = con.execute(
            f"SELECT DISTINCT {col} FROM t WHERE {col} IS NOT NULL"
        ).fetchall()
        obs = _obs_sort(r[0] for r in rows)
        oset, eset = set(obs), set(vs)
        success = {
            "in": oset <= eset, "equal": oset == eset, "contain": eset <= oset
        }[mode]
        return success, obs

    return t, {"column": col, "value_set": vs}, oracle


def g_most_common(rng):
    col = rng.choice(["i", "s"])
    pool = list(range(-5, 20)) if col == "i" else WORDS + ["missing"]
    vs = rng.sample(pool, rng.randrange(1, 5))
    ties_okay = rng.random() < 0.5

    def oracle(con):
        rows = con.execute(
            f"SELECT {col}, count(*) FROM t WHERE {col} IS NOT NULL GROUP BY {col}"
        ).fetchall()
        if not rows:
            return True, []
        mx = max(c for _, c in rows)
        modes = _obs_sort(v for v, c in rows if c == mx)
        inter = len(set(vs) & set(modes))
        # reference: without ties_okay a tie is itself a failure
        success = inter > 0 if ties_okay else (len(modes) == 1 and inter == 1)
        return success, modes

    return (
        "expect_column_most_common_value_to_be_in_set",
        {"column": col, "value_set": vs, "ties_okay": ties_okay},
        oracle,
    )


SET_GENS = [g_distinct_set, g_most_common]


# --- column-pair / multicolumn map grammars (ignore_row_if policies) ------
# Spark and DuckDB share three-valued logic, so `considered AND NOT (expr)`
# drops NULL comparisons identically on both sides — the oracle mirrors the
# engine's unexpected condition (dom & considered & coalesce(~expected, F))


def _considered_sql(cols, policy):
    if policy in ("both_values_are_missing", "all_values_are_missing"):
        return "NOT (" + " AND ".join(f"{c} IS NULL" for c in cols) + ")"
    if policy in ("either_value_is_missing", "any_value_is_missing"):
        return "NOT (" + " OR ".join(f"{c} IS NULL" for c in cols) + ")"
    return "TRUE"


def _draw_policy(rng, default):
    p = rng.choice([None, default, "either_value_is_missing", "neither"])
    if default == "any_value_is_missing" and p in (
        "either_value_is_missing", "neither"
    ):
        p = rng.choice([None, "any_value_is_missing", "never"])
    return p


def _draw_multicol_policy(rng):
    # the column_list policy grammar (engine validates against exactly
    # this set); shared by every multicolumn generator so coverage can't
    # silently drift between them
    return rng.choice(
        [None, "all_values_are_missing", "any_value_is_missing", "never"]
    )


def _pair_gen(rng, t, expected_sql, extra_kwargs=None):
    policy = _draw_policy(rng, "both_values_are_missing")
    kwargs = {"column_A": "i", "column_B": "j", **(extra_kwargs or {})}
    if policy:
        kwargs["ignore_row_if"] = policy
    cons = _considered_sql(["i", "j"], policy or "both_values_are_missing")

    def oracle(con):
        considered = _duck(con, f"SELECT count(*) FROM t WHERE {cons}")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE {cons} AND NOT ({expected_sql})",
        )
        return considered, bad

    return t, kwargs, oracle


def g_pair_equal(rng):
    return _pair_gen(
        rng, "expect_column_pair_values_to_be_equal",
        "i IS NOT DISTINCT FROM j",
    )


def g_pair_greater(rng):
    or_equal = rng.random() < 0.5
    return _pair_gen(
        rng, "expect_column_pair_values_a_to_be_greater_than_b",
        "i >= j" if or_equal else "i > j",
        {"or_equal": or_equal},
    )


def g_pair_in_set(rng):
    # engine's _pair_in_set ORs eqNullSafe terms, so the condition is never
    # NULL and the considered/NOT-expected oracle transfers verbatim; NULL
    # pair members are meaningful (they match NULL cells)
    pool = [None] + list(range(-3, 12))
    pairs = [
        (rng.choice(pool), rng.choice(pool)) for _ in range(rng.randrange(2, 6))
    ]

    def lit(v):
        return "NULL" if v is None else str(v)

    expected = " OR ".join(
        f"(i IS NOT DISTINCT FROM {lit(x)} AND j IS NOT DISTINCT FROM {lit(y)})"
        for x, y in pairs
    )
    return _pair_gen(
        rng,
        "expect_column_pair_values_to_be_in_set",
        expected,
        {"value_pairs_set": pairs},
    )


def g_multicolumn_sum(rng):
    # engine + reference Spark impl COALESCE each column to 0
    # (multicolumn_sum_equal.py _spark), so the oracle coalesces too;
    # default ignore_row_if is all_values_are_missing
    total = rng.randrange(-5, 30)
    policy = _draw_multicol_policy(rng)
    kwargs = {"column_list": ["i", "j"], "sum_total": total}
    if policy:
        kwargs["ignore_row_if"] = policy
    cons = _considered_sql(["i", "j"], policy or "all_values_are_missing")

    def oracle(con):
        considered = _duck(con, f"SELECT count(*) FROM t WHERE {cons}")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE {cons} AND NOT "
            f"(coalesce(i, 0) + coalesce(j, 0) = {total})",
        )
        return considered, bad

    return "expect_multicolumn_sum_to_equal", kwargs, oracle


def g_unique_within_record(rng):
    policy = _draw_multicol_policy(rng)
    kwargs = {"column_list": ["i", "j"]}
    if policy:
        kwargs["ignore_row_if"] = policy
    cons = _considered_sql(["i", "j"], policy or "all_values_are_missing")
    # the deprecated alias shares the exact semantics (dataset.py:4603-4626)
    t = rng.choice(
        [
            "expect_select_column_values_to_be_unique_within_record",
            "expect_multicolumn_values_to_be_unique",
        ]
    )

    def oracle(con):
        considered = _duck(con, f"SELECT count(*) FROM t WHERE {cons}")
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE {cons} AND NOT "
            f"(NOT (i IS NOT DISTINCT FROM j))",
        )
        return considered, bad

    return (t, kwargs, oracle)


PAIR_GENS = [g_pair_equal, g_pair_greater, g_pair_in_set,
             g_multicolumn_sum, g_unique_within_record]
MAP_GENS = MAP_GENS + PAIR_GENS


def g_monotonic(rng):
    # distributed monotonic scan (range repartition + Arrow lag kernel +
    # driver boundary exchange, operators/special.py) vs DuckDB's global
    # window lag over the same order_by; NULLs drop BEFORE the lag, so a
    # row's predecessor is the previous NONNULL value. k is unique — the
    # global ordering is deterministic on both engines. Global-suite only:
    # monotonic items are not partition_capable.
    col = rng.choice(["i", "f"])
    increasing = rng.random() < 0.5
    strictly = rng.random() < 0.5
    t = (
        "expect_column_values_to_be_increasing"
        if increasing
        else "expect_column_values_to_be_decreasing"
    )
    kwargs = {"column": col, "order_by": "k"}
    if strictly:
        kwargs["strictly"] = True
    cmp = {
        (True, True): ">",
        (True, False): ">=",
        (False, True): "<",
        (False, False): "<=",
    }[(increasing, strictly)]

    def oracle(con):
        nn = _duck(con, f"SELECT count({col}) FROM t")
        bad = _duck(
            con,
            f"SELECT count(*) FROM ("
            f"SELECT {col} AS c, lag({col}) OVER (ORDER BY k) AS prev "
            f"FROM t WHERE {col} IS NOT NULL) "
            f"WHERE prev IS NOT NULL AND NOT (c {cmp} prev)",
        )
        return nn, bad

    return t, kwargs, oracle


def g_quantiles(rng):
    # exact path: Spark F.percentile (linear interpolation) == DuckDB
    # quantile_cont; ranges drawn straddling the global values
    col = rng.choice(["i", "f"])
    qs = sorted(rng.sample([0.0, 0.05, 0.25, 0.5, 0.75, 0.9, 1.0],
                           rng.randrange(2, 5)))

    def oracle(con):
        return [
            _duck(con, f"SELECT quantile_cont({col}, {q}) FROM t") for q in qs
        ]

    kwargs = {"column": col,
              "quantile_ranges": {"quantiles": qs, "value_ranges": []}}
    return "expect_column_quantile_values_to_be_between", kwargs, oracle


def _finish_quant_case(rng, t, kwargs, oracle, rc):
    def expect(con):
        vals = oracle(con)
        if any(v is None for v in vals):
            kwargs["quantile_ranges"]["value_ranges"] = [
                [None, None] for _ in vals
            ]
            return False, vals
        ok = True
        ranges = []
        for v in vals:
            lo = v - rng.choice([-0.5, 2.0, 5.0])
            hi = v + rng.choice([-0.5, 2.0, 5.0])
            if rng.random() < 0.2:
                lo = None
            if rng.random() < 0.2:
                hi = None
            ranges.append([lo, hi])
            ok = ok and (lo is None or v >= lo) and (hi is None or v <= hi)
        kwargs["quantile_ranges"]["value_ranges"] = ranges
        return ok, vals

    return t, kwargs, "quant", expect, rc


def _assert_quant(evr, kwargs, vals, label):
    qs = kwargs["quantile_ranges"]["quantiles"]
    got = evr.result.get("observed_value")
    if any(v is None for v in vals):
        assert got is None and evr.success is False, label
        return
    assert got is not None and got["quantiles"] == qs, label
    ok = True
    for g, v, (lo, hi) in zip(
        got["values"], vals, kwargs["quantile_ranges"]["value_ranges"]
    ):
        tol = 1e-9 * max(1.0, abs(v))
        assert abs(g - v) <= tol, f"{label}: {g} vs {v}"
        ok = ok and (lo is None or v >= lo) and (hi is None or v <= hi)
    assert bool(evr.success) == ok, label


def _agg(rng, t, col, sql_fn, ints=False):
    def oracle(con):
        return _duck(con, f"SELECT {sql_fn} FROM t")

    return t, {"column": col}, oracle


AGG_SQL = {
    "expect_column_min_to_be_between": "min({c})",
    "expect_column_max_to_be_between": "max({c})",
    "expect_column_mean_to_be_between": "avg({c})",
    "expect_column_sum_to_be_between": "sum({c})",
    "expect_column_stdev_to_be_between": "stddev_samp({c})",
    "expect_column_median_to_be_between": "median({c})",
    "expect_column_unique_value_count_to_be_between": "count(DISTINCT {c})",
    "expect_column_proportion_of_unique_values_to_be_between":
        "count(DISTINCT {c}) * 1.0 / count({c})",
}


def g_aggregate(rng):
    t = rng.choice(list(AGG_SQL))
    col = rng.choice(["i", "f"])
    sql = AGG_SQL[t].format(c=col)

    def oracle(con):
        return _duck(con, f"SELECT {sql} FROM t")

    return t, {"column": col}, oracle


def g_row_count(rng):
    def oracle(con):
        return _duck(con, "SELECT count(*) FROM t")

    return "expect_table_row_count_to_be_between", {}, oracle


# ---------------------------------------------------------------------------


# row_conditions drawn from the dialect-shared subset (same parse + same
# NULL-drop semantics in Spark SQL and DuckDB); fuzzes the domain-keyed
# metric registration — distinct conditions on one column must not collide
RC_POOL = [
    "i > 3", "i <= 10", "f > 0.0", "f < -2.5",
    "s = 'alpha'", "s <> 'beta'", "i IS NOT NULL",
]


def _draw_rc(rng):
    return rng.choice(RC_POOL) if rng.random() < 0.35 else None


def _finish_map_case(rng, t, kwargs, oracle, rc):
    mostly = None
    if rng.random() < 0.4:
        mostly = rng.choice([0.5, 0.8, 0.95])
        kwargs = {**kwargs, "mostly": mostly}

    def expect(con):
        elem = _duck(con, "SELECT count(*) FROM t")  # t = the rc view
        considered, bad = oracle(con)
        if elem == 0 or considered == 0:
            success = True  # vacuous truth
        elif mostly is None:
            success = bad == 0
        else:
            success = (considered - bad) / considered >= mostly
        return success, int(bad), int(elem)

    return t, kwargs, "map", expect, rc


def _finish_agg_case(rng, t, kwargs, oracle, rc):
    def expect(con):
        v = oracle(con)
        if v is None:
            return False, None
        # bounds straddle the oracle value with a margin far above any
        # cross-engine double noise, so expected success can't flip on ulps
        lo = v - rng.choice([-0.5, 2.0, 5.0])
        hi = v + rng.choice([-0.5, 2.0, 5.0])
        if rng.random() < 0.25:
            lo = None
        if rng.random() < 0.25:
            hi = None
        ok_lo = lo is None or v >= lo
        ok_hi = hi is None or v <= hi
        kwargs["min_value"], kwargs["max_value"] = lo, hi
        return (ok_lo and ok_hi), v

    return t, kwargs, "agg", expect, rc


def _finish_zscore_case(rng, rc):
    """expect_column_value_z_scores_to_be_less_than — the one map condition
    whose literals (mean/stddev) are ENGINE-COMPUTED over the global
    row_condition domain, so the oracle recomputes them in DuckDB and the
    threshold is drawn at the midpoint between two adjacent realized z
    values (guarded distance: cross-engine double noise on the folded
    moments is ~1e-12 relative, realized-z gaps are >= ~1e-4). Degenerate
    domains (stddev undefined or zero) pin the engine's deliberate
    divergence from the reference's Spark path: explicit failure with
    observed_value None, not a silent vacuous pass."""
    col = rng.choice(["i", "f"])
    double_sided = rng.random() < 0.6
    kwargs = {"column": col, "double_sided": double_sided}
    mostly = None
    if rng.random() < 0.4:
        mostly = rng.choice([0.5, 0.8, 0.95])
        kwargs["mostly"] = mostly

    def zstats(con):
        return con.execute(
            f"SELECT avg({col}), stddev_samp({col}) FROM t"
        ).fetchone()

    def expect(con, stats=None):
        m, sd = stats if stats is not None else zstats(con)
        elem = _duck(con, "SELECT count(*) FROM t")
        nonnull = _duck(con, f"SELECT count({col}) FROM t")
        if m is None or sd is None or sd == 0:
            kwargs.setdefault("threshold", 1.0)
            return None  # engine: degenerate -> success False, observed None
        if "threshold" not in kwargs:
            vals = [
                r[0]
                for r in con.execute(
                    f"SELECT DISTINCT {col} FROM t "
                    f"WHERE {col} IS NOT NULL ORDER BY 1"
                ).fetchall()
            ]
            zs = sorted(
                {
                    abs((v - m) / sd) if double_sided else (v - m) / sd
                    for v in vals
                }
            )
            if len(zs) >= 2:
                idx = rng.randrange(len(zs) - 1)
                kwargs["threshold"] = (zs[idx] + zs[idx + 1]) / 2
            else:
                kwargs["threshold"] = (zs[0] + 1.0) if zs else 1.0
        threshold = kwargs["threshold"]
        z = f"(({col} - {m!r}) / {sd!r})"
        zexp = f"abs{z} < {threshold!r}" if double_sided else f"{z} < {threshold!r}"
        bad = _duck(
            con,
            f"SELECT count(*) FROM t WHERE {col} IS NOT NULL AND NOT ({zexp})",
        )
        if elem == 0 or nonnull == 0:
            success = True
        elif mostly is None:
            success = bad == 0
        else:
            success = (nonnull - bad) / nonnull >= mostly
        return success, int(bad), int(elem)

    expect.zstats = zstats
    return (
        "expect_column_value_z_scores_to_be_less_than",
        kwargs,
        "zmap",
        expect,
        rc,
    )


def _draw_case(rng, map_gens=None):
    rc = _draw_rc(rng)
    r = rng.random()
    if r < 0.52:
        g = rng.choice(map_gens or MAP_GENS)
        return _finish_map_case(rng, *g(rng), rc)
    if r < 0.57:
        return _finish_zscore_case(rng, rc)
    if r < 0.7:
        t, kwargs, oracle = rng.choice(SET_GENS)(rng)
        return t, kwargs, "set", oracle, rc
    if r < 0.78:
        return _finish_quant_case(rng, *g_quantiles(rng), rc)
    if r < 0.95:
        return _finish_agg_case(rng, *g_aggregate(rng), rc)
    return _finish_agg_case(rng, *g_row_count(rng), rc)


@pytest.mark.parametrize("ds", range(N_DATASETS))
def test_fuzz_differential_vs_duckdb(spark, ds):
    rng = random.Random(SEED * 1000 + ds)
    n = rng.randrange(40, 250)
    rows = _gen_rows(rng, n)
    df = spark.createDataFrame(
        rows, "i bigint, f double, s string, j bigint, k bigint, js string"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base "
        "(i BIGINT, f DOUBLE, s VARCHAR, j BIGINT, k BIGINT, js VARCHAR)"
    )
    con.executemany("INSERT INTO base VALUES (?, ?, ?, ?, ?, ?)", rows)

    cases = [_draw_case(rng, MAP_GENS + [g_monotonic]) for _ in range(EXP_PER_SUITE)]
    suite = ExpectationSuite(f"fuzz-{ds}")
    expected = []
    for t, kwargs, kind, expect, rc in cases:
        # rebind `t` to the case's row_condition domain so every
        # generator's oracle SQL runs unchanged over the filtered view
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM base WHERE {rc or 'TRUE'}"
        )
        if rc is not None:
            # in place: agg expect() fills bounds into this same dict
            kwargs["row_condition"] = rc
            kwargs["condition_parser"] = "spark"
        exp = expect(con)  # agg cases fill bounds into kwargs here
        suite.add(t, **kwargs)
        expected.append((t, kwargs, kind, exp))

    res = validate(df, suite, result_format="BASIC")
    assert len(res.results) == len(cases)
    for evr, (t, kwargs, kind, exp) in zip(res.results, expected):
        label = f"ds={ds} {t} {kwargs}"
        if kind == "map":
            want_success, want_bad, want_elem = exp
            assert evr.result["unexpected_count"] == want_bad, label
            assert evr.result["element_count"] == want_elem, label
            assert bool(evr.success) == want_success, label
        elif kind == "zmap":
            if exp is None:  # degenerate: stddev undefined or zero
                assert evr.success is False, label
                assert evr.result.get("observed_value") is None, label
                assert "stddev" in evr.result["details"]["error"], label
            else:
                want_success, want_bad, want_elem = exp
                assert evr.result["unexpected_count"] == want_bad, label
                assert evr.result["element_count"] == want_elem, label
                assert bool(evr.success) == want_success, label
        elif kind == "set":
            want_success, want_obs = exp
            assert evr.result["observed_value"] == want_obs, label
            assert bool(evr.success) == want_success, label
        elif kind == "quant":
            _assert_quant(evr, kwargs, exp[1], label)
        else:
            want_success, want_v = exp
            got = evr.result.get("observed_value")
            if want_v is None:
                assert got is None and evr.success is False, label
            else:
                tol = 1e-9 * max(1.0, abs(want_v))
                assert got is not None and abs(got - want_v) <= tol, (
                    f"{label}: {got} vs {want_v}"
                )
                assert bool(evr.success) == want_success, label
    con.close()


# ---------------------------------------------------------------------------
# per-partition differential fuzz (north rule: per-tier verdicts) — the same
# grammars, now validated with partition_by; every per-partition EVR is
# checked against DuckDB over that partition's slice (composed with the
# case's row_condition when drawn)
# ---------------------------------------------------------------------------

N_PART_DATASETS = 12
EXP_PER_PART_SUITE = 6
PART_VALUES = ["p1", "p2", "p3", "p4"]


@pytest.mark.parametrize("ds", range(N_PART_DATASETS))
def test_fuzz_partition_differential_vs_duckdb(spark, ds):
    rng = random.Random(SEED * 7000 + ds)
    n = rng.randrange(40, 200)
    k_parts = rng.randrange(2, 5)
    rows = [
        r + (rng.choice(PART_VALUES[:k_parts]),) for r in _gen_rows(rng, n)
    ]
    df = spark.createDataFrame(
        rows,
        "i bigint, f double, s string, j bigint, k bigint, js string, p string",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base (i BIGINT, f DOUBLE, s VARCHAR, j BIGINT, "
        "k BIGINT, js VARCHAR, p VARCHAR)"
    )
    con.executemany("INSERT INTO base VALUES (?, ?, ?, ?, ?, ?, ?)", rows)

    cases = [_draw_case(rng) for _ in range(EXP_PER_PART_SUITE)]
    suite = ExpectationSuite(f"fuzz-part-{ds}")
    specs = []
    for t, kwargs, kind, expect, rc in cases:
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM base WHERE {rc or 'TRUE'}"
        )
        if rc is not None:
            kwargs["row_condition"] = rc
            kwargs["condition_parser"] = "spark"
        expect(con)  # fills agg bounds / fixes the success rule globally
        suite.add(t, **kwargs)
        specs.append((t, kwargs, kind, expect, rc))

    res = validate(df, suite, result_format="BASIC", partition_by=["p"])
    assert len(res.partition_results) > 0
    by_key = {}
    for evr in res.partition_results:
        cfg = evr.expectation_config
        key = (
            cfg["expectation_type"],
            repr(sorted((k, str(v)) for k, v in cfg["kwargs"].items())),
            evr.partition["p"],
        )
        by_key[key] = evr

    seen_parts = {r[-1] for r in rows}
    checked = 0
    for t, kwargs, kind, expect, rc in specs:
        for pv in sorted(seen_parts):
            con.execute(
                "CREATE OR REPLACE VIEW t AS SELECT * FROM base "
                f"WHERE p = '{pv}' AND ({rc or 'TRUE'})"
            )
            key = (t, repr(sorted((k, str(v)) for k, v in kwargs.items())), pv)
            evr = by_key.get(key)
            label = f"ds={ds} p={pv} {t} {kwargs}"
            if kind == "map":
                uniq_cols = None
                if t == "expect_column_values_to_be_unique":
                    uniq_cols = [kwargs["column"]]
                elif t == "expect_compound_columns_to_be_unique":
                    uniq_cols = list(kwargs["column_list"])
                if uniq_cols is not None:
                    # engine semantics: GLOBALLY duplicated values are
                    # attributed to the partitions of their rows (see
                    # test_uniqueness_per_partition_verdicts), so the
                    # per-partition oracle checks membership in the
                    # domain-global duplicate set, not within-partition dups.
                    # NULL-safe join: compound keys keep NULLs as values.
                    dom_sql = rc or "TRUE"
                    drop_nulls = len(uniq_cols) == 1
                    nn = (
                        " AND ".join(f"{c} IS NOT NULL" for c in uniq_cols)
                        if drop_nulls
                        else _considered_sql(
                            uniq_cols,
                            kwargs.get("ignore_row_if")
                            or "all_values_are_missing",
                        )
                    )
                    cl = ", ".join(uniq_cols)
                    on = " AND ".join(
                        f"a.{c} IS NOT DISTINCT FROM d.{c}" for c in uniq_cols
                    )
                    want_elem = _duck(con, "SELECT count(*) FROM t")
                    considered = _duck(
                        con, f"SELECT count(*) FROM t WHERE {nn}"
                    )
                    want_bad = int(_duck(
                        con,
                        f"SELECT coalesce(sum(a.n), 0) FROM "
                        f"(SELECT count(*) AS n, {cl} FROM t WHERE {nn} "
                        f"GROUP BY {cl}) a JOIN "
                        f"(SELECT {cl} FROM base WHERE ({dom_sql}) AND {nn} "
                        f"GROUP BY {cl} HAVING count(*) > 1) d ON {on}",
                    ))
                    mostly = kwargs.get("mostly")
                    if want_elem == 0 or considered == 0:
                        want_success = True
                    elif mostly is None:
                        want_success = want_bad == 0
                    else:
                        want_success = (
                            (considered - want_bad) / considered >= mostly
                        )
                else:
                    want_success, want_bad, want_elem = expect(con)
                assert evr is not None, label
                assert evr.result["unexpected_count"] == want_bad, label
                assert evr.result["element_count"] == want_elem, label
                assert bool(evr.success) == want_success, label
            elif kind == "zmap":
                # the engine folds mean/stddev from the GLOBAL (rc-filtered)
                # domain as literals; per-partition verdicts count against
                # those global moments, so the oracle does too
                con.execute(
                    "CREATE OR REPLACE VIEW t AS SELECT * FROM base "
                    f"WHERE {rc or 'TRUE'}"
                )
                gstats = expect.zstats(con)
                con.execute(
                    "CREATE OR REPLACE VIEW t AS SELECT * FROM base "
                    f"WHERE p = '{pv}' AND ({rc or 'TRUE'})"
                )
                exp = expect(con, stats=gstats)
                assert evr is not None, label
                if exp is None:  # globally degenerate -> every partition fails
                    assert evr.success is False, label
                    assert evr.result.get("observed_value") is None, label
                else:
                    want_success, want_bad, want_elem = exp
                    assert evr.result["unexpected_count"] == want_bad, label
                    assert evr.result["element_count"] == want_elem, label
                    assert bool(evr.success) == want_success, label
            elif kind == "set":
                # distinct-set / most-common per-partition verdicts are
                # partition-local (the groupBy tops are per partition)
                want_success, want_obs = expect(con)
                assert evr is not None, label
                assert evr.result["observed_value"] == want_obs, label
                assert bool(evr.success) == want_success, label
            elif kind == "quant":
                qcol = kwargs["column"]
                qvals = [
                    _duck(con, f"SELECT quantile_cont({qcol}, {q}) FROM t")
                    for q in kwargs["quantile_ranges"]["quantiles"]
                ]
                assert evr is not None, label
                _assert_quant(evr, kwargs, qvals, label)
            else:
                # re-apply the case's (already fixed) bounds to this
                # partition's observed value
                lo, hi = kwargs.get("min_value"), kwargs.get("max_value")
                sql = (AGG_SQL[t].format(c=kwargs["column"])
                       if t in AGG_SQL else "count(*)")
                v = _duck(con, f"SELECT {sql} FROM t")
                assert evr is not None, label
                got = evr.result.get("observed_value")
                if v is None:
                    assert got is None and evr.success is False, label
                else:
                    tol = 1e-9 * max(1.0, abs(v))
                    assert got is not None and abs(got - v) <= tol, (
                        f"{label}: {got} vs {v}"
                    )
                    want = (lo is None or v >= lo) and (hi is None or v <= hi)
                    assert bool(evr.success) == want, label
            checked += 1
    assert checked >= len(specs) * 2
    con.close()


# ---------------------------------------------------------------------------
# drift-family differential fuzz (VERDICT r4 #7): KL (categorical +
# continuous), PSI (both), chi-square, binned KS — observed bin/category
# counts recomputed by DuckDB over the same (row_condition-filtered) view,
# the driver math reimplemented independently below, thresholds drawn at a
# guarded distance from the computed statistic so expected success can't
# flip on cross-engine float noise.
# ---------------------------------------------------------------------------

N_DRIFT_DATASETS = 12
EXP_PER_DRIFT_SUITE = 6


def _inorm(xs):
    t = float(sum(xs))
    return [x / t for x in xs] if t > 0 else [0.0] * len(xs)


def _ikl(pk, qk):
    pk, qk = _inorm(pk), _inorm(qk)
    s = 0.0
    for p, q in zip(pk, qk):
        if p > 0:
            if q == 0:
                return math.inf
            s += p * math.log(p / q)
    return s


def _ipsi(p, q, eps=1e-6):
    p = [max(x, eps) for x in _inorm(p)]
    q = [max(x, eps) for x in _inorm(q)]
    p, q = _inorm(p), _inorm(q)
    return sum((a - b) * math.log(a / b) for a, b in zip(p, q))


def _igammainc_q(a, x):
    """Regularized upper incomplete gamma Q(a, x) — series for x < a+1,
    Lentz continued fraction otherwise (standard numerics, written fresh)."""
    if a <= 0 or x < 0:
        return 1.0
    if x == 0:
        return 1.0
    lg = math.lgamma(a)
    if x < a + 1:
        term = 1.0 / a
        s = term
        n = a
        for _ in range(1000):
            n += 1
            term *= x / n
            s += term
            if abs(term) < abs(s) * 1e-16:
                break
        return max(0.0, min(1.0, 1.0 - s * math.exp(-x + a * math.log(x) - lg)))
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 1000):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    return max(0.0, min(1.0, h * math.exp(-x + a * math.log(x) - lg)))


def _ichi2_sf(stat, df):
    if df <= 0:
        return 1.0
    if math.isinf(stat):
        return 0.0
    return _igammainc_q(df / 2.0, stat / 2.0)


def _ikolm_sf(lam):
    if lam <= 0:
        return 1.0
    s = sum(
        (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        for k in range(1, 101)
    )
    return max(0.0, min(1.0, 2.0 * s))


def _iks_pvalue(d, n):
    if n <= 0:
        return 1.0
    return _ikolm_sf((math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d)


def _cat_adjust(observed_counts, nonnull, values, weights, tail_holdout):
    """Reference categorical alignment (union sorted by (type, str); unseen
    values share tail_holdout; expected scaled by 1-tail_holdout)."""
    expected = dict(zip(values, weights))
    union = sorted(
        set(values) | set(observed_counts),
        key=lambda v: (str(type(v).__name__), str(v)),
    )
    pk = [observed_counts.get(v, 0) / nonnull if nonnull else 0.0 for v in union]
    missing = [v for v in union if v not in expected]
    if missing and tail_holdout > 0:
        qk = [
            expected[v] * (1 - tail_holdout)
            if v in expected
            else tail_holdout / len(missing)
            for v in union
        ]
    else:
        qk = [expected.get(v, 0.0) for v in union]
    return union, pk, qk


def _icont_weights(bins, weights, tail_weights, th, ih, counts, below, above, nn):
    ew = [w * (1 - th - ih) for w in weights]
    if ih > 0:
        zeros = [i for i, w in enumerate(ew) if w == 0]
        for i in zeros:
            ew[i] = ih / len(zeros)
    ow = [c / nn for c in counts]
    left_inf, right_inf = math.isinf(bins[0]), math.isinf(bins[-1])
    if left_inf and right_inf:
        return ow, ew
    if left_inf:
        return ow + [above / nn], ew + [th]
    if right_inf:
        return [below / nn] + ow, [th] + ew
    if tail_weights is not None:
        return [below / nn] + ow + [above / nn], [tail_weights[0]] + ew + [tail_weights[1]]
    return [below / nn] + ow + [above / nn], [th / 2] + ew + [th / 2]


def _flit(v):
    if math.isinf(v):
        return f"CAST('{'-' if v < 0 else ''}infinity' AS DOUBLE)"
    return repr(float(v))


def _duck_cat_counts(con, col):
    rows = con.execute(
        f"SELECT {col}, count(*) FROM t WHERE {col} IS NOT NULL GROUP BY {col}"
    ).fetchall()
    return {r[0]: int(r[1]) for r in rows}, sum(int(r[1]) for r in rows)


def _duck_hist(con, col, bins):
    """Observed histogram with the engine's binning: [lo, hi) bins, last
    closed; below = x < b0; above = x > b_last; plus the nonnull count."""
    k = len(bins) - 1
    parts = []
    for i in range(k):
        hi_op = "<=" if i == k - 1 else "<"
        parts.append(
            f"count(*) FILTER (WHERE {col} >= {_flit(bins[i])} "
            f"AND {col} {hi_op} {_flit(bins[i + 1])})"
        )
    parts.append(f"count(*) FILTER (WHERE {col} < {_flit(bins[0])})")
    parts.append(f"count(*) FILTER (WHERE {col} > {_flit(bins[-1])})")
    parts.append(f"count({col})")
    row = con.execute(f"SELECT {', '.join(parts)} FROM t").fetchone()
    return [int(c) for c in row[:k]], int(row[k]), int(row[k + 1]), int(row[k + 2])


def _cat_po(rng, col):
    pool = WORDS + ["missing"] if col == "s" else list(range(-5, 20))
    vals = rng.sample(pool, rng.randrange(2, 6))
    w = [rng.uniform(0.05, 1.0) for _ in vals]
    s = sum(w)
    return {"values": vals, "weights": [x / s for x in w]}


def _cont_po(rng, allow_tails=True):
    k = rng.randrange(2, 6)
    start = rng.uniform(-12.0, 0.0)
    edges = [start]
    for _ in range(k):
        edges.append(edges[-1] + rng.uniform(0.5, 8.0))
    w = [0.0 if rng.random() < 0.12 else rng.uniform(0.05, 1.0) for _ in range(k)]
    if sum(w) == 0:
        w[0] = 1.0
    r = rng.random()
    po = {"bins": edges}
    th = 0.0
    ih = rng.uniform(0.01, 0.1) if rng.random() < 0.25 else 0.0
    if r < 0.15:
        edges[0] = -math.inf
        po["weights"] = _inorm(w)
    elif r < 0.30:
        edges[-1] = math.inf
        po["weights"] = _inorm(w)
        if rng.random() < 0.5:
            th = rng.uniform(0.01, 0.15)
    elif r < 0.40:
        edges[0], edges[-1] = -math.inf, math.inf
        po["weights"] = _inorm(w)
    elif allow_tails and r < 0.65:
        tw = [rng.uniform(0.01, 0.1), rng.uniform(0.01, 0.1)]
        t = sum(w) + sum(tw)
        po["weights"] = [x / t for x in w]
        po["tail_weights"] = [x / t for x in tw]
    else:
        po["weights"] = _inorm(w)
        if rng.random() < 0.5:
            th = rng.uniform(0.01, 0.2)
    return po, th, ih


def _away(rng, v, delta, lo=None, hi=None):
    """A threshold at distance >= min(deltas)·~1 from v, clipped to bounds —
    expected success can never flip on float noise."""
    opts = [v + delta]
    if (lo is None or v - delta > lo) and v - delta >= 0:
        opts.append(v - delta)
    t = rng.choice(opts)
    if lo is not None:
        t = max(t, lo)
    if hi is not None:
        t = min(t, hi)
    return t


# raw-statistic recomputations shared by the global generators and the
# per-partition replay: (raw_stat, nonnull, details); raw None = empty slice
def _kl_cat_raw(con, col, po, th_hold):
    counts, nonnull = _duck_cat_counts(con, col)
    _, pk, qk = _cat_adjust(counts, nonnull, po["values"], po["weights"], th_hold)
    return _ikl(pk, qk), nonnull, {}


def _kl_cont_raw(con, col, po, th_hold, ih):
    bins = [float(b) for b in po["bins"]]
    counts, below, above, nonnull = _duck_hist(con, col, bins)
    if nonnull == 0:
        return None, 0, {}
    comb_o, comb_e = _icont_weights(
        bins, po["weights"], po.get("tail_weights"), th_hold, ih,
        counts, below, above, nonnull,
    )
    return _ikl(comb_o, comb_e), nonnull, {}


def _psi_cat_raw(con, col, po):
    counts, nonnull = _duck_cat_counts(con, col)
    aligned = [counts.get(v, 0) for v in po["values"]]
    vset = set(po["values"])
    extra = sum(c for v, c in counts.items() if v not in vset)
    pk = aligned + ([extra] if extra else [])
    qk = list(po["weights"]) + ([0.0] if extra else [])
    return _ipsi(pk, qk), nonnull, {}


def _psi_cont_raw(con, col, po):
    bins = [float(b) for b in po["bins"]]
    counts, below, above, nonnull = _duck_hist(con, col, bins)
    if nonnull == 0:
        return None, 0, {}
    v = _ipsi([below] + counts + [above], [0.0] + po["weights"] + [0.0])
    return v, nonnull, {}


def _chi2_raw(con, col, po, th_hold):
    counts, nonnull = _duck_cat_counts(con, col)
    union, _, qk = _cat_adjust(counts, nonnull, po["values"], po["weights"], th_hold)
    obs = [counts.get(v, 0) for v in union]
    n = float(sum(obs))
    w = _inorm(qk)
    stat = 0.0
    for o, wi in zip(obs, w):
        e = n * wi
        if e == 0:
            if o > 0:
                stat = math.inf
                break
            continue
        stat += (o - e) ** 2 / e
    pval = _ichi2_sf(stat, len(obs) - 1)
    aligned = [counts.get(v, 0) for v in po["values"]]
    return pval, nonnull, {
        "chi_square_statistic": stat,
        "observed_counts": aligned,
    }


def _binned_ks_raw(con, col, po):
    bins = [float(b) for b in po["bins"]]
    counts, below, above, nonnull = _duck_hist(con, col, bins)
    if nonnull == 0:
        return None, 0, {}
    obs = _inorm([below] + counts + [above])
    exp = _inorm([0.0] + po["weights"] + [0.0])
    d = cp = cq = 0.0
    for pi, qi in zip(obs, exp):
        cp += pi
        cq += qi
        d = max(d, abs(cp - cq))
    return _iks_pvalue(d, nonnull), nonnull, {"ks_statistic": d}


def _kl_slice_check(kwargs, raw_fn):
    """Per-slice expected result under the case's already-fixed threshold;
    None = slice skipped (no nonnull rows — vacuous semantics not pinned)."""
    def slice_check(con):
        raw, nonnull, det = raw_fn(con)
        if nonnull == 0:
            return None
        thr = kwargs.get("threshold")
        bad = raw is None or math.isinf(raw) or math.isnan(raw)
        return {
            "success": True if thr is None else (not bad) and raw <= thr,
            "observed": None if bad else raw,
            "details": det,
        }

    return slice_check


def _pval_slice_check(kwargs, raw_fn, param):
    def slice_check(con):
        raw, nonnull, det = raw_fn(con)
        if nonnull == 0:
            return None
        return {"success": raw > kwargs[param], "observed": raw, "details": det}

    return slice_check


def _psi_slice_check(kwargs, raw_fn):
    def slice_check(con):
        raw, nonnull, det = raw_fn(con)
        if nonnull == 0:
            return None
        return {
            "success": raw < kwargs["threshold"],
            "observed": raw,
            "details": det,
        }

    return slice_check


def g_drift_kl_cat(rng):
    col = rng.choice(["s", "i"])
    po = _cat_po(rng, col)
    th_hold = rng.uniform(0.01, 0.2) if rng.random() < 0.4 else 0.0
    kwargs = {
        "column": col,
        "partition_object": po,
        "tail_weight_holdout": th_hold,
    }
    raw_fn = lambda con: _kl_cat_raw(con, col, po, th_hold)  # noqa: E731

    def check(con):
        kl, _, _ = raw_fn(con)
        bad = math.isinf(kl) or math.isnan(kl)
        if rng.random() < 0.15:
            kwargs["threshold"] = None
            return {"success": True, "observed": None if bad else kl}
        thr = 1.0 if bad else _away(rng, kl, 0.05 + 0.1 * abs(kl), lo=0.0)
        kwargs["threshold"] = thr
        return {
            "success": (not bad) and kl <= thr,
            "observed": None if bad else kl,
        }

    return (
        "expect_column_kl_divergence_to_be_less_than",
        kwargs,
        check,
        _kl_slice_check(kwargs, raw_fn),
    )


def g_drift_kl_cont(rng):
    col = rng.choice(["i", "f"])
    po, th_hold, ih = _cont_po(rng)
    bins = [float(b) for b in po["bins"]]
    kwargs = {
        "column": col,
        "partition_object": po,
        "tail_weight_holdout": th_hold,
        "internal_weight_holdout": ih,
    }

    raw_fn = lambda con: _kl_cont_raw(con, col, po, th_hold, ih)  # noqa: E731

    def check(con):
        kl, nonnull, _ = raw_fn(con)
        if nonnull == 0:
            kwargs["threshold"] = rng.uniform(0.1, 2.0)
            return {"success": True, "observed": None}
        bad = math.isinf(kl) or math.isnan(kl)
        if rng.random() < 0.15:
            kwargs["threshold"] = None
            return {"success": True, "observed": None if bad else kl}
        thr = 1.0 if bad else _away(rng, kl, 0.05 + 0.1 * abs(kl), lo=0.0)
        kwargs["threshold"] = thr
        return {
            "success": (not bad) and kl <= thr,
            "observed": None if bad else kl,
        }

    return (
        "expect_column_kl_divergence_to_be_less_than",
        kwargs,
        check,
        _kl_slice_check(kwargs, raw_fn),
    )


def g_drift_psi(rng):
    col_cat = rng.choice(["s", "i"])
    if rng.random() < 0.5:
        po = _cat_po(rng, col_cat)
        kwargs = {"column": col_cat, "partition_object": po}

        raw_cat = lambda con: _psi_cat_raw(con, col_cat, po)  # noqa: E731

        def check(con):
            v, _, _ = raw_cat(con)
            thr = _away(rng, v, 0.05 + 0.1 * v, lo=1e-4)
            kwargs["threshold"] = thr
            return {"success": v < thr, "observed": v}

        return (
            "expect_column_psi_to_be_less_than",
            kwargs,
            check,
            _psi_slice_check(kwargs, raw_cat),
        )

    col = rng.choice(["i", "f"])
    po, _, _ = _cont_po(rng, allow_tails=False)
    po.pop("tail_weights", None)
    bins = [float(b) for b in po["bins"]]
    kwargs = {"column": col, "partition_object": po}

    raw_cont = lambda con: _psi_cont_raw(con, col, po)  # noqa: E731

    def check(con):
        v, nonnull, _ = raw_cont(con)
        if nonnull == 0:
            kwargs["threshold"] = rng.uniform(0.1, 2.0)
            return {"success": True, "observed": None}
        thr = _away(rng, v, 0.05 + 0.1 * v, lo=1e-4)
        kwargs["threshold"] = thr
        return {"success": v < thr, "observed": v}

    return (
        "expect_column_psi_to_be_less_than",
        kwargs,
        check,
        _psi_slice_check(kwargs, raw_cont),
    )


def g_drift_chi2(rng):
    col = rng.choice(["s", "i"])
    po = _cat_po(rng, col)
    th_hold = rng.uniform(0.01, 0.2) if rng.random() < 0.4 else 0.0
    t = rng.choice([
        "expect_column_chi_square_test_p_value_to_be_greater_than",
        "expect_column_chisquare_test_p_value_to_be_greater_than",
    ])
    kwargs = {
        "column": col,
        "partition_object": po,
        "tail_weight_holdout": th_hold,
    }

    raw_fn = lambda con: _chi2_raw(con, col, po, th_hold)  # noqa: E731

    def check(con):
        pval, _, det = raw_fn(con)
        p_thr = _away(rng, pval, 0.15, lo=1e-3, hi=0.999)
        if abs(pval - p_thr) < 1e-4:  # clip collision — force the other side
            p_thr = max(1e-3, pval - 0.15)
        kwargs["p"] = p_thr
        return {"success": pval > p_thr, "observed": pval, "details": det}

    return t, kwargs, check, _pval_slice_check(kwargs, raw_fn, "p")


def g_drift_binned_ks(rng):
    col = rng.choice(["i", "f"])
    po, _, _ = _cont_po(rng, allow_tails=False)
    po.pop("tail_weights", None)
    # finite edges only: the binned-KS compiler takes the po verbatim
    bins = [float(b) for b in po["bins"]]
    if math.isinf(bins[0]):
        bins[0] = -50.0
    if math.isinf(bins[-1]):
        bins[-1] = 60.0
    po["bins"] = bins
    kwargs = {"column": col, "partition_object": po}

    raw_fn = lambda con: _binned_ks_raw(con, col, po)  # noqa: E731

    def check(con):
        pval, nonnull, det = raw_fn(con)
        if nonnull == 0:
            kwargs["p"] = 0.05
            return {"success": True, "observed": None}
        p_thr = _away(rng, pval, 0.15, lo=1e-3, hi=0.999)
        if abs(pval - p_thr) < 1e-4:
            p_thr = max(1e-3, pval - 0.15)
        kwargs["p"] = p_thr
        return {"success": pval > p_thr, "observed": pval, "details": det}

    return (
        "expect_column_kstest_p_value_to_be_greater_than",
        kwargs,
        check,
        _pval_slice_check(kwargs, raw_fn, "p"),
    )


DRIFT_GENS = [
    g_drift_kl_cat,
    g_drift_kl_cont,
    g_drift_psi,
    g_drift_chi2,
    g_drift_binned_ks,
]


@pytest.mark.parametrize("ds", range(N_DRIFT_DATASETS))
def test_fuzz_drift_differential_vs_duckdb(spark, ds):
    rng = random.Random(SEED * 3300 + ds)
    n = rng.randrange(40, 250)
    rows = _gen_rows(rng, n)
    df = spark.createDataFrame(
        rows, "i bigint, f double, s string, j bigint, k bigint, js string"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base "
        "(i BIGINT, f DOUBLE, s VARCHAR, j BIGINT, k BIGINT, js VARCHAR)"
    )
    con.executemany("INSERT INTO base VALUES (?, ?, ?, ?, ?, ?)", rows)

    suite = ExpectationSuite(f"fuzz-drift-{ds}")
    expected = []
    for _ in range(EXP_PER_DRIFT_SUITE):
        rc = _draw_rc(rng)
        t, kwargs, check, _slice = rng.choice(DRIFT_GENS)(rng)
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM base WHERE {rc or 'TRUE'}"
        )
        if rc is not None:
            kwargs["row_condition"] = rc
            kwargs["condition_parser"] = "spark"
        exp = check(con)  # computes the oracle AND fills threshold/p kwargs
        suite.add(t, **kwargs)
        expected.append((t, kwargs, exp))

    res = validate(df, suite, result_format="BASIC")
    assert len(res.results) == len(expected)
    for evr, (t, kwargs, exp) in zip(res.results, expected):
        label = f"ds={ds} {t} {kwargs}"
        assert evr.exception_info is None or not evr.exception_info.get(
            "raised_exception"
        ), f"{label}: {evr.exception_info}"
        _assert_drift_evr(evr, exp, label)
    con.close()


def _assert_drift_evr(evr, exp, label):
    got = evr.result.get("observed_value")
    want = exp["observed"]
    if want is None:
        assert got is None, f"{label}: {got} vs None"
    else:
        tol = 1e-7 * max(1.0, abs(want))
        assert got is not None and abs(got - want) <= tol, (
            f"{label}: {got} vs {want}"
        )
    assert bool(evr.success) == exp["success"], label
    for dk, dv in exp.get("details", {}).items():
        gd = evr.result["details"][dk]
        if isinstance(dv, float):
            if math.isinf(dv):
                assert math.isinf(gd), f"{label}: {dk}"
            else:
                assert abs(gd - dv) <= 1e-7 * max(1.0, abs(dv)), (
                    f"{label}: {dk} {gd} vs {dv}"
                )
        else:
            assert gd == dv, f"{label}: {dk} {gd} vs {dv}"


# ---------------------------------------------------------------------------
# per-partition drift replay (north rule: per-tier verdicts): the same drift
# cases with their globally-fixed thresholds, validated with partition_by;
# every per-partition EVR's observed statistic, verdict, and details are
# recomputed over that partition's slice (composed with the row_condition).
# Slices with zero nonnull rows are skipped — their vacuous semantics are
# pinned by the engine's own tests, not replicated here.
# ---------------------------------------------------------------------------

N_DRIFT_PART_DATASETS = 8
EXP_PER_DRIFT_PART_SUITE = 5


@pytest.mark.parametrize("ds", range(N_DRIFT_PART_DATASETS))
def test_fuzz_drift_partition_differential_vs_duckdb(spark, ds):
    rng = random.Random(SEED * 4100 + ds)
    n = rng.randrange(60, 250)
    k_parts = rng.randrange(2, 5)
    rows = [
        r + (rng.choice(PART_VALUES[:k_parts]),) for r in _gen_rows(rng, n)
    ]
    df = spark.createDataFrame(
        rows,
        "i bigint, f double, s string, j bigint, k bigint, js string, p string",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base (i BIGINT, f DOUBLE, s VARCHAR, j BIGINT, "
        "k BIGINT, js VARCHAR, p VARCHAR)"
    )
    con.executemany("INSERT INTO base VALUES (?, ?, ?, ?, ?, ?, ?)", rows)

    suite = ExpectationSuite(f"fuzz-drift-part-{ds}")
    specs = []
    for _ in range(EXP_PER_DRIFT_PART_SUITE):
        rc = _draw_rc(rng)
        t, kwargs, check, slice_check = rng.choice(DRIFT_GENS)(rng)
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM base WHERE {rc or 'TRUE'}"
        )
        if rc is not None:
            kwargs["row_condition"] = rc
            kwargs["condition_parser"] = "spark"
        check(con)  # fixes threshold/p in kwargs against the global view
        suite.add(t, **kwargs)
        specs.append((t, kwargs, slice_check, rc))

    res = validate(df, suite, result_format="BASIC", partition_by=["p"])
    assert len(res.partition_results) > 0
    by_key = {}
    for evr in res.partition_results:
        cfg = evr.expectation_config
        key = (
            cfg["expectation_type"],
            repr(sorted((k, str(v)) for k, v in cfg["kwargs"].items())),
            evr.partition["p"],
        )
        by_key[key] = evr

    seen_parts = {r[-1] for r in rows}
    checked = 0
    for t, kwargs, slice_check, rc in specs:
        for pv in sorted(seen_parts):
            con.execute(
                "CREATE OR REPLACE VIEW t AS SELECT * FROM base "
                f"WHERE p = '{pv}' AND ({rc or 'TRUE'})"
            )
            exp = slice_check(con)
            if exp is None:
                continue  # empty slice
            key = (t, repr(sorted((k, str(v)) for k, v in kwargs.items())), pv)
            evr = by_key.get(key)
            label = f"ds={ds} p={pv} {t} {kwargs}"
            assert evr is not None, label
            _assert_drift_evr(evr, exp, label)
            checked += 1
    assert checked >= len(specs) * 2
    con.close()


# ---------------------------------------------------------------------------
# strftime differential fuzz — the oracle is Python's datetime.strptime,
# the reference's EXACT per-row implementation
# (column_values_match_strftime_format.py:33-60 wraps datetime.strptime in
# F.udf), reimplemented here the way the drift layer reimplements the
# driver math. The engine compiles formats to CPython's own TimeRE regexes
# (conditions.py strftime section), so NOTHING is steered around: every
# mutation class — zero-stripping, over-padding, digit swaps, truncation,
# case flips, whitespace-run doubling, non-digit injection — applies to
# every format, including all-digit adjacent runs (regex backtracking),
# literal-digit neighbors, month names, %j, and the %c/%x locale
# composites.
# ---------------------------------------------------------------------------

STRF_SEP_FMTS = [
    "%Y-%m-%d", "%Y-%m-%d %H:%M:%S", "%d/%m/%Y", "%m/%d/%Y %H:%M",
    "%H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%d.%m.%Y", "%y-%m-%d", "%I:%M %p",
    "%d %b %Y", "%B %d, %Y", "%Y-%j", "%m-%d", "%c", "%x",
    "%H:%M:%S%z", "%Y-%m-%dT%H:%M:%S%z",
    "%Y %U %w", "%Y %W %a", "%m-%d %U %w", "%Y-%m-%d %Z",
    "%G %V %u", "%G %V %a",
]
STRF_ADJ_FMTS = ["%Y%m%d", "%H%M%S", "%Y%m%d%H%M%S", "%d5%m5%Y", "%H%M5"]
N_STRF_DATASETS = 8
EXP_PER_STRF_SUITE = 5


def _strf_value(rng, fmt):
    dt = datetime.datetime(
        rng.randrange(1200, 2400), rng.randrange(1, 13), rng.randrange(1, 29),
        rng.randrange(0, 24), rng.randrange(0, 60), rng.randrange(0, 60),
    )
    if "%Z" in fmt:
        # aware so %Z formats the tz name ('UTC'); strptime matches the
        # locale name set {utc, gmt, tzname} case-insensitively
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    if "%z" in fmt:
        # aware datetimes so %z formats a real offset (naive gives '');
        # boundary ±23:59 sometimes, so mutations straddle the ±24h limit
        mins = 1439 if rng.random() < 0.15 else rng.randrange(0, 1440)
        sign = rng.choice((1, -1))
        dt = dt.replace(
            tzinfo=datetime.timezone(datetime.timedelta(minutes=sign * mins))
        )
    v = dt.strftime(fmt)
    r = rng.random()
    if r < 0.28:
        return v  # exactly as formatted
    if r < 0.38:
        return re.sub(r"\b0(\d)", r"\1", v)  # non-padded: Python accepts
    if r < 0.46:
        i = rng.randrange(len(v) + 1)
        return v[:i] + "0" + v[i:]  # over-pad: usually breaks a digit shape
    if r < 0.56:
        # swap one digit for 9 — may stay valid (day 14→19) or break a
        # field's range (month 03→93); the strptime oracle decides
        idxs = [i for i, c in enumerate(v) if c.isdigit()]
        i = rng.choice(idxs)
        return v[:i] + "9" + v[i + 1 :]
    if r < 0.63:
        return v[:-1]  # truncate (often leaves a valid 1-digit last field)
    if r < 0.70:
        return v.swapcase()  # strptime is case-insensitive end to end
    if r < 0.76 and " " in v:
        return v.replace(" ", "  ", 1)  # format whitespace matches \s+ runs
    if r < 0.84:
        i = rng.randrange(len(v) + 1)
        return v[:i] + "x" + v[i:]  # non-digit injection: fails everywhere
    if r < 0.94:
        # datetime-construction boundary splice: overwrite a digit run with
        # a value TimeRE's regex may accept but datetime construction
        # rejects (leap seconds 60/61, %z hour 24, year 9999/0000) or a
        # field-range breaker (13, 99); inserting ':' builds the
        # colon-inconsistent %z forms strptime's parse code refuses
        runs = [m for m in re.finditer(r"\d\d(\d\d)?", v)]
        if runs and rng.random() < 0.75:
            m = rng.choice(runs)
            if len(m.group()) == 4:
                sub = rng.choice(("9999", "0000"))
            else:
                sub = rng.choice(("60", "61", "24", "13", "00", "99"))
            return v[: m.start()] + sub + v[m.end() :]
        i = rng.randrange(len(v) + 1)
        return v[:i] + ":" + v[i:]
    return rng.choice(["", "garbage", v + " ", " " + v, v + "x"])


@pytest.mark.parametrize("ds", range(N_STRF_DATASETS))
def test_fuzz_strftime_differential_vs_strptime(spark, ds):
    rng = random.Random(SEED * 5200 + ds)
    pool = rng.sample(STRF_SEP_FMTS, 3)
    if rng.random() < 0.5:
        pool[0] = rng.choice(STRF_ADJ_FMTS)
    n = rng.randrange(60, 220)
    rows = []
    for _ in range(n):
        d = None if rng.random() < 0.08 else _strf_value(rng, rng.choice(pool))
        i = None if rng.random() < 0.1 else rng.randrange(0, 12)
        rows.append((d, i))
    df = spark.createDataFrame(rows, "d string, i bigint")

    rc_pool = [
        (None, lambda r: True),
        ("i > 5", lambda r: r[1] is not None and r[1] > 5),
        ("i IS NOT NULL", lambda r: r[1] is not None),
    ]
    suite = ExpectationSuite(f"fuzz-strf-{ds}")
    cases = []
    for _ in range(EXP_PER_STRF_SUITE):
        fmt = rng.choice(pool)
        kwargs = {"column": "d", "strftime_format": fmt}
        rc_sql, rc_py = rng.choice(rc_pool)
        if rc_sql is not None:
            kwargs["row_condition"] = rc_sql
            kwargs["condition_parser"] = "spark"
        mostly = rng.choice([0.5, 0.8, 0.95]) if rng.random() < 0.4 else None
        if mostly is not None:
            kwargs["mostly"] = mostly

        dom = [r for r in rows if rc_py(r)]
        considered = [r[0] for r in dom if r[0] is not None]
        bad = 0
        for v in considered:
            try:
                datetime.datetime.strptime(v, fmt)
            except ValueError:
                bad += 1
        if not dom or not considered:
            success = True  # vacuous, same rule as _finish_map_case
        elif mostly is None:
            success = bad == 0
        else:
            success = (len(considered) - bad) / len(considered) >= mostly
        suite.add("expect_column_values_to_match_strftime_format", **kwargs)
        cases.append((kwargs, success, bad, len(dom)))

    res = validate(df, suite, result_format="BASIC")
    assert len(res.results) == len(cases)
    for evr, (kwargs, success, bad, elem) in zip(res.results, cases):
        label = f"ds={ds} {kwargs}"
        assert evr.result["unexpected_count"] == bad, label
        assert evr.result["element_count"] == elem, label
        assert bool(evr.success) == success, label


# ---------------------------------------------------------------------------
# Cramér's-phi differential fuzz — the oracle re-implements the reference's
# pandas path (get_binned_values + pd.crosstab + scipy-equivalent
# chi2_contingency, pandas_dataset.py:559-634 / dataset.py:4428-4441) in
# pandas/numpy inside the test, with ONE documented deviation shared with
# the engine: ties in the string top-n are broken (count desc, str asc)
# instead of pandas value_counts insertion order. Exercises numeric
# auto/explicit binning, string identity/top-n/"(other)" collapse,
# "(missing)" categories, the Yates dof-1 correction, the full-row-count
# denominator, and row_condition domains.
# ---------------------------------------------------------------------------


def _ref_binned(series, numeric, bins, n_bins):
    import numpy as np
    import pandas as pd

    if n_bins is None:
        n_bins = 10
    if numeric:
        nonnull = series[series.notnull()]
        if len(nonnull) == 0:
            return pd.Series(["(missing)"] * len(series), index=series.index)
        if bins is not None:
            edges = sorted({float(x) for x in bins})
            if nonnull.min() < edges[0]:
                edges = [float(nonnull.min())] + edges
            if nonnull.max() > edges[-1]:
                edges = edges + [float(nonnull.max())]
            edges = np.asarray(edges, dtype=float)
        else:
            edges = np.histogram_bin_edges(nonnull, bins=n_bins)
        edges[-1] = np.nextafter(edges[-1], edges[-1] + 1)
        codes = np.digitize(series.astype(float), bins=edges) - 1
        out = []
        for v, c in zip(series, codes):
            if v is None or (isinstance(v, float) and v != v):
                out.append("(missing)")
            elif c < 0:
                out.append(None)  # dropped from the crosstab
            elif c >= len(edges) - 1:
                out.append("(missing)")
            else:
                out.append(c)
        return pd.Series(out, index=series.index, dtype=object)
    if bins is not None:
        repl = {}
        for group in bins:
            for v in group:
                repl[v] = ", ".join(group)
        return series.map(lambda v: repl.get(v, v)).fillna("(missing)")
    vc = series.value_counts()
    if len(vc) < n_bins + 1:
        return series.fillna("(missing)")
    keep = {
        v for v, _ in sorted(vc.items(), key=lambda kv: (-kv[1], str(kv[0])))[:n_bins]
    }
    return series.map(
        lambda v: v if v in keep else "(other)", na_action="ignore"
    ).fillna("(missing)")


def _ref_cramers(pdf, a, b, kwargs):
    import numpy as np
    import pandas as pd

    sA = _ref_binned(
        pdf[a], pdf[a].dtype.kind in "if", kwargs.get("bins_A"), kwargs.get("n_bins_A")
    )
    sB = _ref_binned(
        pdf[b], pdf[b].dtype.kind in "if", kwargs.get("bins_B"), kwargs.get("n_bins_B")
    )
    ct = pd.crosstab(sA, columns=sB)
    if min(ct.shape, default=0) < 2:
        # scipy dof-0 -> chi2 0; reference sqrt(0/N/0) -> nan -> FAIL
        return float("nan"), 0.0
    obs = ct.values.astype(float)
    rs = obs.sum(1, keepdims=True)
    cs = obs.sum(0, keepdims=True)
    exp = rs @ cs / obs.sum()
    if (ct.shape[0] - 1) * (ct.shape[1] - 1) == 1:
        d = np.maximum(np.abs(obs - exp) - 0.5, 0.0)  # Yates
    else:
        d = np.abs(obs - exp)
    chi2 = float((d * d / exp).sum())
    phi = max(min(math.sqrt(chi2 / len(pdf) / (min(ct.shape) - 1)), 1.0), 0.0)
    return phi, chi2


N_CRAMERS_DATASETS = 6


@pytest.mark.parametrize("ds", range(N_CRAMERS_DATASETS))
def test_fuzz_cramers_phi_vs_pandas_replica(spark, ds):
    import pandas as pd

    rng = random.Random(SEED * 6100 + ds)
    n = rng.randrange(50, 200)
    pool_b = [f"v{j}" for j in range(rng.randrange(3, 15))]
    rows = []
    for _ in range(n):
        ia = None if rng.random() < 0.1 else rng.randrange(0, rng.choice([3, 8, 30]))
        fa = None if rng.random() < 0.1 else round(rng.uniform(-5.0, 15.0), 3)
        sa = None if rng.random() < 0.12 else rng.choice(["a", "b", "c", "d"])
        sb = None if rng.random() < 0.12 else rng.choice(pool_b)
        rows.append((ia, fa, sa, sb))
    df = spark.createDataFrame(rows, "ia bigint, fa double, sa string, sb string")

    cols = {"ia": True, "fa": True, "sa": False, "sb": False}
    suite = ExpectationSuite(f"fuzz-cramers-{ds}")
    expected = []
    for _ in range(4):
        a, b = rng.sample(list(cols), 2)
        kwargs = {"column_A": a, "column_B": b}
        for side, col in (("A", a), ("B", b)):
            r = rng.random()
            if r < 0.35:
                kwargs[f"n_bins_{side}"] = rng.randrange(2, 6)
            elif r < 0.55 and cols[col]:
                lo, hi = sorted(rng.uniform(-5, 15) for _ in range(2))
                kwargs[f"bins_{side}"] = sorted(
                    {round(rng.uniform(lo, hi), 2) for _ in range(rng.randrange(2, 5))}
                )
            elif r < 0.7 and not cols[col]:
                # explicit STRING value groups (reference
                # pandas_dataset.py:604-609): listed values merge into the
                # joined group label, uncovered values keep identity
                pool = ["a", "b", "c", "d"] if col == "sa" else pool_b
                picked = rng.sample(pool, min(len(pool), rng.randrange(2, 5)))
                cut = rng.randrange(1, len(picked))
                groups = [picked[:cut], picked[cut:]]
                kwargs[f"bins_{side}"] = [g for g in groups if g]
        rc = rng.choice([None, "ia IS NOT NULL", "fa > 0"])
        dom = [
            r for r in rows
            if rc is None
            or (rc == "ia IS NOT NULL" and r[0] is not None)
            or (rc == "fa > 0" and r[1] is not None and r[1] > 0)
        ]
        pdf = pd.DataFrame(dom, columns=["ia", "fa", "sa", "sb"])
        want_phi, want_chi2 = _ref_cramers(pdf, a, b, kwargs)
        if rc is not None:
            kwargs["row_condition"] = rc
            kwargs["condition_parser"] = "spark"
        # threshold far from the realized phi so success can't flip on ulps
        # (degenerate nan fails at ANY threshold, like the reference)
        kwargs["threshold"] = (
            0.5 if math.isnan(want_phi)
            else max(want_phi + rng.choice([-0.05, 0.05]), 1e-6)
        )
        suite.add("expect_column_pair_cramers_phi_value_to_be_less_than", **kwargs)
        expected.append((kwargs, want_phi, want_chi2))

    res = validate(df, suite, result_format="BASIC")
    for evr, (kwargs, want_phi, want_chi2) in zip(res.results, expected):
        label = f"ds={ds} {kwargs}"
        got = evr.result["observed_value"]
        if math.isnan(want_phi):  # degenerate crosstab: nan + failure
            assert got is not None and math.isnan(got), label
            assert evr.success is False, label
            continue
        assert got is not None and abs(got - want_phi) < 1e-9, (
            f"{label}: {got} vs {want_phi}"
        )
        assert abs(evr.result["details"]["chi_squared"] - want_chi2) < 1e-6, label
        assert bool(evr.success) == (want_phi < kwargs["threshold"]), label


# ---------------------------------------------------------------------------
# dateutil-parseable differential fuzz — the oracle is dateutil.parser.parse
# itself (the reference's pandas kernel,
# column_values_dateutil_parseable.py:14-28; it has no Spark path), which is
# exactly what the engine's Arrow kernel calls — this guards the
# None-handling, the caught-exception set (ValueError/OverflowError only),
# and the mostly/row_condition plumbing around it. Values reuse the strftime
# mutation families plus free-form prose dateutil uniquely accepts.
# ---------------------------------------------------------------------------

DATEUTIL_EXTRA = [
    "Sat Oct 11 17:13:46 2003", "5th of March 2001", "2021", "13/5/2016",
    "March", "12:60", "today", " ", "2020.02.29", "20-II-1980",
]


@pytest.mark.parametrize("ds", range(3))
def test_fuzz_dateutil_parseable_vs_dateutil(spark, ds):
    from dateutil.parser import parse as _du_parse

    rng = random.Random(SEED * 6100 + ds)
    fmts = rng.sample(STRF_SEP_FMTS, 4)
    rows = []
    for _ in range(rng.randrange(80, 200)):
        r = rng.random()
        if r < 0.1:
            d = None
        elif r < 0.25:
            d = rng.choice(DATEUTIL_EXTRA)
        else:
            d = _strf_value(rng, rng.choice(fmts))
        rows.append((d, rng.randrange(0, 10)))
    df = spark.createDataFrame(rows, "d string, i bigint")

    def oracle_ok(v):
        try:
            _du_parse(v)
            return True
        except (ValueError, OverflowError):
            return False

    suite = ExpectationSuite(f"fuzz-dateutil-{ds}")
    cases = []
    for _ in range(4):
        kwargs = {"column": "d"}
        rc = rng.choice([None, "i > 4"])
        if rc is not None:
            kwargs["row_condition"] = rc
            kwargs["condition_parser"] = "spark"
        mostly = rng.choice([0.5, 0.9]) if rng.random() < 0.5 else None
        if mostly is not None:
            kwargs["mostly"] = mostly
        dom = [r for r in rows if rc is None or r[1] > 4]
        considered = [r[0] for r in dom if r[0] is not None]
        bad = sum(0 if oracle_ok(v) else 1 for v in considered)
        if not considered:
            success = True
        elif mostly is None:
            success = bad == 0
        else:
            success = (len(considered) - bad) / len(considered) >= mostly
        suite.add("expect_column_values_to_be_dateutil_parseable", **kwargs)
        cases.append((kwargs, success, bad, len(dom)))

    res = validate(df, suite, result_format="BASIC")
    for evr, (kwargs, success, bad, elem) in zip(res.results, cases):
        label = f"ds={ds} {kwargs}"
        assert evr.result["unexpected_count"] == bad, label
        assert evr.result["element_count"] == elem, label
        assert bool(evr.success) == success, label

"""Declarative expectation configuration + suite.

Mirrors the reference data model (WHAT, not HOW):
- ExpectationConfiguration = {expectation_type, kwargs, meta}
  (reference: great_expectations/core/expectation_configuration.py)
- ExpectationSuite = named list of configurations + meta
  (reference: great_expectations/core/expectation_suite.py)
- Deterministic identity hashing of kwarg dicts
  (reference: great_expectations/core/id_dict.py:6-45 IDDict.to_id()).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Iterable


def _json_default(o: Any) -> Any:
    return str(o)


def deterministic_id(obj: Any) -> str:
    """Stable hash of a JSON-serializable object (sorted keys).

    Same role as the reference's IDDict.to_id() (core/id_dict.py:6-45):
    metric/domain identity = hash of the sorted-key kwargs dict.
    """
    payload = json.dumps(obj, sort_keys=True, default=_json_default)
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()[:16]


# kwarg keys that describe the domain (sub-slice of the batch) rather than
# the success criteria — mirrors the reference's domain/success kwarg split
# (expectations/expectation.py:162-175).
DOMAIN_KEYS = (
    "column",
    "column_A",
    "column_B",
    "column_list",
    "row_condition",
    "condition_parser",
    "ignore_row_if",
)

RUNTIME_KEYS = ("result_format", "catch_exceptions")


@dataclass
class ExpectationConfiguration:
    expectation_type: str
    kwargs: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    @property
    def domain_kwargs(self) -> dict[str, Any]:
        return {k: v for k, v in self.kwargs.items() if k in DOMAIN_KEYS and v is not None}

    @property
    def success_kwargs(self) -> dict[str, Any]:
        return {
            k: v
            for k, v in self.kwargs.items()
            if k not in DOMAIN_KEYS and k not in RUNTIME_KEYS
        }

    @property
    def domain_id(self) -> str:
        return deterministic_id(self.domain_kwargs)

    @property
    def id(self) -> str:
        return deterministic_id(
            {"type": self.expectation_type, "kwargs": self.kwargs}
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "expectation_type": self.expectation_type,
            "kwargs": dict(self.kwargs),
            "meta": dict(self.meta),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationConfiguration":
        # kwargs/meta are allow_none in the reference schema
        # (ExpectationConfigurationSchema, expectation_configuration.py:1452-1467)
        return cls(
            expectation_type=d["expectation_type"],
            kwargs=dict(d.get("kwargs") or {}),
            meta=dict(d.get("meta") or {}),
        )


@dataclass
class ExpectationSuite:
    name: str
    expectations: list[ExpectationConfiguration] = field(default_factory=list)
    meta: dict[str, Any] = field(default_factory=dict)
    evaluation_parameters: dict[str, Any] = field(default_factory=dict)

    def add(self, expectation_type: str, **kwargs: Any) -> ExpectationConfiguration:
        cfg = ExpectationConfiguration(expectation_type=expectation_type, kwargs=kwargs)
        self.expectations.append(cfg)
        return cfg

    def extend(self, cfgs: Iterable[ExpectationConfiguration]) -> None:
        self.expectations.extend(cfgs)

    @property
    def id(self) -> str:
        return deterministic_id(
            {"name": self.name, "expectations": [c.to_dict() for c in self.expectations]}
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "expectations": [c.to_dict() for c in self.expectations],
            "meta": dict(self.meta),
            "evaluation_parameters": dict(self.evaluation_parameters),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExpectationSuite":
        """Build a suite from either this engine's dict shape or the
        reference's on-disk serialization.

        The reference writes suites with ``expectation_suite_name`` plus
        optional ``data_asset_type`` / ``ge_cloud_id`` top-level keys
        (ExpectationSuiteSchema, core/expectation_suite.py:970-976); both
        spellings are accepted so a reference user's existing suite JSON
        files load unchanged. Unknown reference-side keys are preserved in
        ``meta["reference_extras"]`` so a round-trip through
        ``to_reference_dict`` is lossless.
        """
        name = d.get("expectation_suite_name", d.get("name", "unnamed"))
        meta = dict(d.get("meta") or {})
        extras = {
            k: d[k]
            for k in ("data_asset_type", "ge_cloud_id")
            if d.get(k) is not None
        }
        if extras:
            # copy the nested dict: meta is only a shallow copy of the
            # caller's dict, and update() in place would mutate their input
            meta["reference_extras"] = {
                **(meta.get("reference_extras") or {}),
                **extras,
            }
        return cls(
            name=name,
            expectations=[
                ExpectationConfiguration.from_dict(c) for c in d.get("expectations") or []
            ],
            meta=meta,
            evaluation_parameters=dict(d.get("evaluation_parameters") or {}),
        )

    def to_reference_dict(self) -> dict[str, Any]:
        """Serialize in the reference's ExpectationSuiteSchema key layout
        (``expectation_suite_name``; empty meta/evaluation_parameters
        dropped, matching the schema's clean_empty behavior)."""
        meta = dict(self.meta)
        extras = meta.pop("reference_extras", {})
        out: dict[str, Any] = {
            "expectation_suite_name": self.name,
            "expectations": [c.to_dict() for c in self.expectations],
        }
        out.update(extras)
        if self.evaluation_parameters:
            out["evaluation_parameters"] = dict(self.evaluation_parameters)
        if meta:
            out["meta"] = meta
        return out

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=_json_default)

    def to_reference_json(self) -> str:
        return json.dumps(self.to_reference_dict(), indent=2, default=_json_default)

    @classmethod
    def from_json(cls, s: str) -> "ExpectationSuite":
        return cls.from_dict(json.loads(s))


class EvaluationParameterError(KeyError):
    pass


def substitute_evaluation_parameters(
    cfg: "ExpectationConfiguration",
    params: dict[str, Any],
    urn_resolver: Any = None,
) -> "ExpectationConfiguration":
    """Resolve ``{"$PARAMETER": <expr>}`` kwarg values — the reference's
    evaluation-parameter substitution (validator/validator.py:356-361,
    core/evaluation_parameters.py:307-421). A bare bound name substitutes
    verbatim (complex types allowed); anything else goes through the
    expression language in core/eval_params.py (arithmetic, now()/datetime()/
    timedelta() etc., and urn:great_expectations: lookups via
    ``urn_resolver``)."""

    def sub(v: Any) -> Any:
        if isinstance(v, dict):
            if "$PARAMETER" in v:
                name = v["$PARAMETER"]
                if name in params:
                    return params[name]
                from great_expectations_spark.core.eval_params import (
                    parse_evaluation_parameter,
                )

                return parse_evaluation_parameter(name, params, urn_resolver)
            return {k: sub(x) for k, x in v.items()}
        if isinstance(v, list):
            return [sub(x) for x in v]
        return v

    needs = any(
        isinstance(v, (dict, list)) for v in cfg.kwargs.values()
    )
    if not needs:
        return cfg
    return ExpectationConfiguration(
        expectation_type=cfg.expectation_type,
        kwargs={k: sub(v) for k, v in cfg.kwargs.items()},
        meta=dict(cfg.meta),
    )

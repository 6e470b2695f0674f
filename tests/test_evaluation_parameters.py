"""Evaluation-parameter substitution (reference validator.py:356-361,
core/evaluation_parameters.py:307-421 — plain-name binding, no URN grammar)."""

import pytest

from great_expectations_spark.core.config import (
    EvaluationParameterError,
    ExpectationConfiguration,
    ExpectationSuite,
    substitute_evaluation_parameters,
)
from great_expectations_spark.engine import SparkValidationEngine


def test_substitute_nested():
    cfg = ExpectationConfiguration(
        "expect_column_values_to_be_between",
        {"column": "x", "min_value": {"$PARAMETER": "lo"}, "max_value": 10},
    )
    out = substitute_evaluation_parameters(cfg, {"lo": 3})
    assert out.kwargs == {"column": "x", "min_value": 3, "max_value": 10}
    # original untouched
    assert cfg.kwargs["min_value"] == {"$PARAMETER": "lo"}


def test_unbound_raises():
    cfg = ExpectationConfiguration(
        "expect_column_values_to_be_between",
        {"column": "x", "min_value": {"$PARAMETER": "nope"}},
    )
    with pytest.raises(EvaluationParameterError):
        substitute_evaluation_parameters(cfg, {})


def test_engine_binding_priority(spark, lineitem):
    suite = ExpectationSuite(name="ep", evaluation_parameters={"max_q": 5})
    suite.add(
        "expect_column_max_to_be_between",
        column="l_quantity",
        max_value={"$PARAMETER": "max_q"},
    )
    eng = SparkValidationEngine(spark)
    # suite-level binding: max 50 > 5 → fail
    res = eng.validate(lineitem, suite)
    assert res.results[0].success is False
    # explicit arg overrides suite-level → pass
    res2 = eng.validate(lineitem, suite, evaluation_parameters={"max_q": 100})
    assert res2.results[0].success is True


def test_unbound_parameter_becomes_failed_evr(spark, lineitem):
    suite = ExpectationSuite(name="ep2", evaluation_parameters={"other": 1})
    suite.add(
        "expect_column_max_to_be_between",
        column="l_quantity",
        max_value={"$PARAMETER": "missing"},
    )
    res = SparkValidationEngine(spark).validate(lineitem, suite)
    assert res.results[0].success is False
    assert res.results[0].exception_info["raised_exception"] is True

"""Distributional completions: Cramér's phi, parameterized KS, chisquare /
bootstrapped-KS aliases, JSON-schema map expectation."""

import math

from pyspark.sql import functions as F

from great_expectations_spark.core.config import ExpectationSuite
from great_expectations_spark.engine import validate
from great_expectations_spark.functions.stats import (
    expon_cdf,
    norm_cdf,
    parameterized_cdf,
    uniform_cdf,
)


def test_cramers_phi_dependent_vs_independent(spark, lineitem):
    s = ExpectationSuite(name="phi")
    # l_returnflag vs itself-derived column: perfectly associated → phi = 1
    df = lineitem.withColumn("rf_copy", F.col("l_returnflag"))
    s.add(
        "expect_column_pair_cramers_phi_value_to_be_less_than",
        column_A="l_returnflag",
        column_B="rf_copy",
        threshold=0.5,
    )
    res = validate(df, s)
    assert res.results[0].success is False
    assert abs(res.results[0].result["observed_value"] - 1.0) < 1e-9

    # vs an (almost) independent column → phi near 0
    s2 = ExpectationSuite(name="phi2")
    s2.add(
        "expect_column_pair_cramers_phi_value_to_be_less_than",
        column_A="l_returnflag",
        column_B="l_linestatus",
        threshold=0.1,
    )
    res2 = validate(lineitem, s2)
    assert res2.results[0].success is True
    assert res2.results[0].result["observed_value"] < 0.05


def test_parameterized_ks_uniform(spark, lineitem):
    """l_quantity ~ uniform(1, 50) by construction → high p-value; a wrong
    normal hypothesis → p ≈ 0."""
    s = ExpectationSuite(name="ks")
    s.add(
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        column="l_quantity",
        distribution="uniform",
        params={"min": 1.0, "range": 49.0},
        p_value=0.01,
    )
    s.add(
        "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than",
        column="l_quantity",
        distribution="norm",
        params={"mean": 5.0, "std_dev": 1.0},
        p_value=0.05,
    )
    res = validate(lineitem, s)
    uni, bad_norm = res.results
    assert uni.result["details"]["ks_statistic"] < 0.05
    assert bad_norm.success is False
    assert bad_norm.result["observed_value"] < 1e-6


def test_reference_spelling_aliases(spark, lineitem):
    s = ExpectationSuite(name="alias")
    s.add(
        "expect_column_chisquare_test_p_value_to_be_greater_than",
        column="l_returnflag",
        partition_object={"values": ["A", "N", "R"], "weights": [1 / 3] * 3},
        p=0.0,
    )
    s.add(
        "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than",
        column="l_quantity",
        partition_object={
            "bins": [1.0, 13.25, 25.5, 37.75, 50.0],
            "weights": [0.25] * 4,
        },
        p=1e-9,
    )
    res = validate(lineitem, s)
    assert all(not r.exception_info["raised_exception"] for r in res.results)


def test_cdf_helpers():
    assert abs(norm_cdf(0.0) - 0.5) < 1e-12
    assert abs(norm_cdf(1.96) - 0.975) < 1e-3
    assert uniform_cdf(5, 0, 10) == 0.5
    assert abs(expon_cdf(math.log(2), 0, 1.0) - 0.5) < 1e-12
    f = parameterized_cdf("norm", [0.0, 1.0])
    assert abs(f(0.0) - 0.5) < 1e-12


def test_match_json_schema(spark, events):
    schema = {
        "type": "object",
        "properties": {"k": {"type": "integer", "minimum": 0}},
        "required": ["k"],
    }
    s = ExpectationSuite(name="js")
    s.add("expect_column_values_to_match_json_schema", column="props", json_schema=schema)
    res = validate(events, s)
    assert res.results[0].success is True
    assert res.results[0].result["unexpected_count"] == 0

    # negative: require a key that doesn't exist
    s2 = ExpectationSuite(name="js2")
    s2.add(
        "expect_column_values_to_match_json_schema",
        column="props",
        json_schema={"type": "object", "required": ["missing_key"]},
    )
    res2 = validate(events, s2)
    assert res2.results[0].success is False
    assert res2.results[0].result["unexpected_count"] == events.count()

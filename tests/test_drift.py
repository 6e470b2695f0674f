"""Distribution-drift expectations: KL / PSI / KS / chi-square, continuous
(histogram in the bundled agg pass) and categorical (shared groupBy pass),
plus the pure-math helpers."""

import math

import pytest

from great_expectations_spark import ExpectationSuite, validate
from great_expectations_spark.functions import stats


def run_one(df, t, **kwargs):
    suite = ExpectationSuite("t")
    suite.add(t, **kwargs)
    return validate(df, suite, result_format="BASIC").results[0]


# ---- pure math ----------------------------------------------------------


def test_kl_divergence_math():
    assert stats.kl_divergence([1, 1], [1, 1]) == 0.0
    assert math.isinf(stats.kl_divergence([1, 1], [1, 0]))
    # KL([.75,.25],[.5,.5]) = .75 ln1.5 + .25 ln.5
    expected = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    assert abs(stats.kl_divergence([3, 1], [1, 1]) - expected) < 1e-12


def test_psi_math():
    assert stats.psi([1, 1], [1, 1]) < 1e-9
    assert stats.psi([9, 1], [1, 9]) > 1.0


def test_ks_math():
    assert stats.ks_from_histograms([1, 1, 1, 1], [1, 1, 1, 1]) == 0.0
    assert abs(stats.ks_from_histograms([1, 0], [0, 1]) - 1.0) < 1e-12


def test_chi2_sf_known_values():
    # chi2 sf(3.841, df=1) ≈ 0.05; sf(5.991, df=2) ≈ 0.05
    assert abs(stats.chi2_sf(3.841459, 1) - 0.05) < 1e-4
    assert abs(stats.chi2_sf(5.991465, 2) - 0.05) < 1e-4
    assert abs(stats.chi2_sf(0.0, 3) - 1.0) < 1e-12


def test_chi_square_test():
    stat, p = stats.chi_square_test([25, 25, 25, 25], [1, 1, 1, 1])
    assert stat == 0.0 and abs(p - 1.0) < 1e-9
    stat, p = stats.chi_square_test([50, 10, 20, 20], [1, 1, 1, 1])
    assert stat > 30 and p < 1e-5


def test_kolmogorov_sf():
    assert stats.kolmogorov_sf(0.0) == 1.0
    assert stats.kolmogorov_sf(10.0) < 1e-12
    # Q(1.36) ≈ 0.049 (the classic 5% critical value)
    assert abs(stats.kolmogorov_sf(1.36) - 0.049) < 2e-3


# ---- Spark end-to-end ---------------------------------------------------


@pytest.fixture(scope="module")
def uniformish(spark):
    # 1000 values spread evenly over [0, 10)
    return spark.createDataFrame(
        [(i % 1000 / 100.0,) for i in range(1000)], ["v"]
    )


UNIFORM_PARTITION = {
    "bins": [0.0, 2.5, 5.0, 7.5, 10.0],
    "weights": [0.25, 0.25, 0.25, 0.25],
}


def test_kl_continuous_pass(uniformish):
    evr = run_one(
        uniformish,
        "expect_column_kl_divergence_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=0.05,
    )
    assert evr.success, evr.result
    assert evr.result["observed_value"] < 1e-6
    obs = evr.result["details"]["observed_partition"]
    assert obs["weights"] == [0.25, 0.25, 0.25, 0.25]
    assert obs["tail_weights"] == [0.0, 0.0]


def test_kl_continuous_fail_on_shifted(spark):
    shifted = spark.createDataFrame([(i % 500 / 100.0,) for i in range(1000)], ["v"])
    evr = run_one(
        shifted,
        "expect_column_kl_divergence_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=0.05,
    )
    assert evr.success is False


def test_kl_out_of_bins_inf_without_holdout(spark):
    df = spark.createDataFrame([(15.0,), (1.0,), (2.0,), (6.0,)], ["v"])
    evr = run_one(
        df,
        "expect_column_kl_divergence_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=10.0,
    )
    assert evr.success is False
    assert evr.result["observed_value"] is None  # inf serialized as None
    # with tail holdout it becomes finite
    evr = run_one(
        df,
        "expect_column_kl_divergence_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=10.0,
        tail_weight_holdout=0.1,
    )
    assert evr.success is True


def test_kl_categorical(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, ["g"]
    )
    evr = run_one(
        df,
        "expect_column_kl_divergence_to_be_less_than",
        column="g",
        partition_object={"values": ["a", "b", "c"], "weights": [0.5, 0.3, 0.2]},
        threshold=0.01,
    )
    assert evr.success, evr.result
    evr = run_one(
        df,
        "expect_column_kl_divergence_to_be_less_than",
        column="g",
        partition_object={"values": ["a", "b", "c"], "weights": [0.2, 0.3, 0.5]},
        threshold=0.01,
    )
    assert evr.success is False


def test_kl_profiling_mode_respects_row_condition(spark):
    """partition_object=None (profiling mode) derives the expected partition
    from the SAME row_condition domain the observed side measures — a
    conditioned KL of a batch against itself is ~0. Before the fix the
    expected side profiled the WHOLE table, so a domain whose distribution
    differs from the table's spuriously failed."""
    rows = [("a", "x")] * 40 + [("b", "y")] * 60
    df = spark.createDataFrame(rows, "g string, s string")
    evr = run_one(
        df,
        "expect_column_kl_divergence_to_be_less_than",
        column="s",
        threshold=0.05,
        bucketize_data=False,
        row_condition="g = 'a'",
        condition_parser="spark",
    )
    assert evr.success is True, evr.result
    op = evr.result["details"]["observed_partition"]
    assert op["values"] == ["x"] and op["weights"] == [1.0]

    # continuous branch: the domain's values sit far from the rest of the
    # table; profiling the domain against itself must still be ~0
    rows2 = [(float(i % 10), "a") for i in range(100)] + [
        (100.0 + i, "b") for i in range(50)
    ]
    df2 = spark.createDataFrame(rows2, "v double, g string")
    evr = run_one(
        df2,
        "expect_column_kl_divergence_to_be_less_than",
        column="v",
        threshold=0.05,
        row_condition="g = 'a'",
        condition_parser="spark",
    )
    assert evr.success is True, evr.result


def test_psi_continuous(uniformish, spark):
    evr = run_one(
        uniformish,
        "expect_column_psi_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=0.1,
    )
    assert evr.success
    drifted = spark.createDataFrame([(i % 300 / 100.0,) for i in range(1000)], ["v"])
    evr = run_one(
        drifted,
        "expect_column_psi_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=0.1,
    )
    assert evr.success is False


def test_ks_continuous(uniformish):
    evr = run_one(
        uniformish,
        "expect_column_kstest_p_value_to_be_greater_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        p=0.05,
    )
    assert evr.success, evr.result


def test_chi_square_spark(spark):
    df = spark.createDataFrame(
        [("a",)] * 52 + [("b",)] * 28 + [("c",)] * 20, ["g"]
    )
    evr = run_one(
        df,
        "expect_column_chi_square_test_p_value_to_be_greater_than",
        column="g",
        partition_object={"values": ["a", "b", "c"], "weights": [0.5, 0.3, 0.2]},
        p=0.05,
    )
    assert evr.success, evr.result
    evr = run_one(
        df,
        "expect_column_chi_square_test_p_value_to_be_greater_than",
        column="g",
        partition_object={"values": ["a", "b", "c"], "weights": [0.1, 0.3, 0.6]},
        p=0.05,
    )
    assert evr.success is False


def test_drift_per_partition(spark):
    rows = [("png", i % 100 / 10.0) for i in range(1000)]
    rows += [("jpeg", (i % 30) / 10.0) for i in range(300)]  # drifted: only [0,3)
    df = spark.createDataFrame(rows, ["fmt", "v"])
    suite = ExpectationSuite("drift")
    suite.add(
        "expect_column_kl_divergence_to_be_less_than",
        column="v",
        partition_object=UNIFORM_PARTITION,
        threshold=0.05,
        tail_weight_holdout=1e-9,
    )
    res = validate(df, suite, result_format="BASIC", partition_by=["fmt"])
    parts = {r.partition["fmt"]: r for r in res.partition_results}
    assert parts["png"].success is True
    assert parts["jpeg"].success is False


def test_histogram_drift_distinct_row_conditions(spark):
    """register_histogram keys carry the domain id: the same column+bins
    under different row_conditions must not share bin-count aliases."""
    rows = [(10.0 + i * 0.1, "a") for i in range(10)] + [
        (float(100 * i), "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    po = {"bins": [10.0, 10.5, 11.0], "weights": [0.5, 0.5]}
    suite = ExpectationSuite("kl_rc")
    suite.add("expect_column_kl_divergence_to_be_less_than", column="v",
              partition_object=po, threshold=0.1,
              row_condition="g = 'a'", condition_parser="spark")
    suite.add("expect_column_kl_divergence_to_be_less_than", column="v",
              partition_object=po, threshold=0.1)
    res = validate(df, suite)
    assert res.results[0].success is True
    assert res.results[0].result["observed_value"] == 0.0
    # whole table: group b's mass lands above the bins -> tail > holdout
    assert res.results[1].success is False

"""violations_df — distributed COMPLETE-mode replacement (no driver collect)."""

from pyspark.sql import functions as F

from great_expectations_spark.core.config import ExpectationSuite
from great_expectations_spark.plans.violations import VIOLATIONS_COL, violations_df


def _suite():
    s = ExpectationSuite(name="v")
    s.add("expect_column_values_to_be_between", column="l_quantity", min_value=1, max_value=40)
    s.add("expect_column_values_to_be_in_set", column="l_returnflag", value_set=["A", "N"])
    s.add("expect_table_row_count_to_be_between", min_value=1)  # non-map: ignored
    return s


def test_rows_and_labels_match_filters(spark, lineitem):
    v = violations_df(lineitem, _suite())
    total_violating = lineitem.filter(
        (F.col("l_quantity") > 40) | (F.col("l_returnflag") == "R")
    ).count()
    assert v.count() == total_violating

    between_rows = v.filter(
        F.array_contains(VIOLATIONS_COL, "expect_column_values_to_be_between")
    ).count()
    assert between_rows == lineitem.filter("l_quantity > 40").count()

    in_set_rows = v.filter(
        F.array_contains(VIOLATIONS_COL, "expect_column_values_to_be_in_set")
    ).count()
    assert in_set_rows == lineitem.filter("l_returnflag = 'R'").count()


def test_column_projection_and_write(spark, lineitem, tmp_path):
    v = violations_df(lineitem, _suite(), columns=["l_orderkey", "l_linenumber"])
    assert v.columns == ["l_orderkey", "l_linenumber", VIOLATIONS_COL]
    out = str(tmp_path / "viol")
    v.write.parquet(out)
    assert spark.read.parquet(out).count() == v.count()


def test_duplicate_types_get_suffix(spark, lineitem):
    s = ExpectationSuite(name="d")
    s.add("expect_column_values_to_be_between", column="l_quantity", max_value=10)
    s.add("expect_column_values_to_be_between", column="l_quantity", max_value=20)
    v = violations_df(lineitem, s)
    labels = {
        r[0]
        for r in v.select(F.explode(VIOLATIONS_COL)).distinct().collect()
    }
    assert labels == {
        "expect_column_values_to_be_between",
        "expect_column_values_to_be_between#1",
    }


def test_no_map_expectations_empty(spark, lineitem):
    s = ExpectationSuite(name="e")
    s.add("expect_table_row_count_to_be_between", min_value=1)
    v = violations_df(lineitem, s)
    assert v.count() == 0
    assert VIOLATIONS_COL in v.columns


def test_summary_sampling_single_scan(spark, lineitem):
    """SUMMARY/COMPLETE sampling must evaluate ALL failing expectations in
    ONE labeled pass over the base df (violations_df plan shape) — not one
    re-scan per failing expectation."""
    from great_expectations_spark.core.config import ExpectationSuite
    from great_expectations_spark.plans.planner import SuitePlanner, _Ctx

    suite = ExpectationSuite(name="scan")
    # three failing map expectations → three sample branches
    suite.add("expect_column_values_to_be_between", column="l_quantity", min_value=1, max_value=10)
    suite.add("expect_column_values_to_be_in_set", column="l_returnflag", value_set=["A"])
    suite.add("expect_column_values_to_match_regex", column="l_linestatus", regex="^F$")

    planner = SuitePlanner(lineitem, suite, result_format="SUMMARY")
    planner.compile()
    global_metrics, _ = planner._run_bundles(lineitem)
    ctx = _Ctx()
    ctx.metrics = global_metrics

    class CountingDF:
        def __init__(self, df):
            self._df = df
            self.base_touches = 0

        def filter(self, *a, **k):
            self.base_touches += 1
            return self._df.filter(*a, **k)

        def select(self, *a, **k):
            self.base_touches += 1
            return self._df.select(*a, **k)

        def __getattr__(self, name):
            return getattr(self._df, name)

    counting = CountingDF(lineitem)
    planner._run_samples(counting, ctx)
    assert counting.base_touches == 1, "sample phase re-scanned the base df"
    # all three expectations produced counts from that single scan
    assert len(ctx.sample_counts) == 3
    # value counts are exact: between-violations count == metric count
    for eid, counts in ctx.sample_counts.items():
        assert all(c >= 1 for _, c in counts)

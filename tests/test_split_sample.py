"""Splitters + samplers (SURVEY.md §2.A; reference
split_and_sample/sparkdf_data_splitter.py:38-322, sparkdf_data_sampler.py:35-203)."""

import pytest
from pyspark.sql import functions as F

from great_expectations_spark.sources import split_sample as ss


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_split_on_column_value(spark, orders):
    part = orders.filter(ss.split_on_column_value("o_orderstatus", "F"))
    assert part.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    assert part.select("o_orderstatus").distinct().collect()[0][0] == "F"


def test_split_on_multi_column_values(spark, lineitem):
    pred = ss.split_on_multi_column_values({"l_returnflag": "A", "l_linestatus": "F"})
    got = lineitem.filter(pred).count()
    want = lineitem.filter("l_returnflag = 'A' AND l_linestatus = 'F'").count()
    assert got == want > 0


def test_split_on_date_parts(events):
    row = events.select(
        F.year("ts").alias("y"), F.month("ts").alias("m")
    ).first()
    pred = ss.split_on_year_month("ts", row["y"], row["m"])
    part = events.filter(pred)
    assert part.count() > 0
    bad = part.filter(
        (F.year("ts") != row["y"]) | (F.month("ts") != row["m"])
    ).count()
    assert bad == 0


def test_split_mod_and_divided_cover_table(orders):
    total = orders.count()
    mod_parts = sum(
        orders.filter(ss.split_on_mod_integer("o_orderkey", 4, v)).count()
        for v in range(4)
    )
    assert mod_parts == total
    div_parts = sum(
        orders.filter(ss.split_on_divided_integer("o_orderkey", 5000, v)).count()
        for v in range(0, 4)
    )
    assert div_parts == total


def test_split_on_hashed_column_partitions_disjoint_and_complete(orders):
    total = orders.count()
    counts = [
        orders.filter(ss.split_on_hashed_column("o_orderkey", 1, d)).count()
        for d in "0123456789abcdef"
    ]
    assert sum(counts) == total
    assert max(counts) < total  # actually split


def test_distinct_partition_values(lineitem):
    parts = ss.distinct_partition_values(lineitem, ["l_returnflag"])
    assert [p["l_returnflag"] for p in parts] == ["A", "N", "R"]


def test_sample_using_limit(orders):
    assert ss.sample_using_limit(orders, 17).count() == 17


def test_sample_using_random_deterministic(orders):
    a = ss.sample_using_random(orders, 0.25, seed=7).count()
    b = ss.sample_using_random(orders, 0.25, seed=7).count()
    total = orders.count()
    assert a == b
    assert 0.15 * total < a < 0.35 * total


def test_sample_using_mod_and_list(orders):
    m = ss.sample_using_mod(orders, "o_orderkey", 10, 3)
    assert m.filter(F.pmod("o_orderkey", F.lit(10)) != 3).count() == 0
    s = ss.sample_using_a_list(orders, "o_orderstatus", ["F"])
    assert s.select("o_orderstatus").distinct().count() == 1


def test_sample_using_hash_deterministic_subset(orders):
    a = ss.sample_using_hash(orders, "o_orderkey", 1, "f")
    b = ss.sample_using_hash(orders, "o_orderkey", 1, "f")
    na, nb = a.count(), b.count()
    assert na == nb
    total = orders.count()
    assert 0 < na < total


def test_unique_approx_reconciliation(spark, orders):
    """Uniqueness details carry exact vs approx distinct counts (north rule)."""
    from great_expectations_spark.core.config import ExpectationSuite
    from great_expectations_spark.engine import validate

    s = ExpectationSuite(name="u")
    s.add("expect_column_values_to_be_unique", column="o_orderkey")
    res = validate(orders, s)
    det = res.results[0].result["details"]
    assert det["distinct_count_exact"] == orders.count()
    assert det["distinct_count_approx"] is not None
    assert det["approx_rel_error"] < 0.05  # rsd=0.01 HLL vs exact


def test_metrics_persisted(spark, orders, tmp_path):
    """Resolved metrics rows (global + per-partition) persist to the metrics
    table (north rule: per-partition lineage + metrics)."""
    from great_expectations_spark.core.config import ExpectationSuite
    from great_expectations_spark.engine import SparkValidationEngine
    from great_expectations_spark.sources.stores import ResultsStore

    s = ExpectationSuite(name="m")
    s.add("expect_column_mean_to_be_between", column="o_totalprice", min_value=0, max_value=1e9)
    s.add("expect_column_values_to_not_be_null", column="o_custkey")
    eng = SparkValidationEngine(spark)
    res = eng.validate(orders, s, partition_by=["o_orderstatus"])
    assert res.metrics["global"]
    assert res.metrics["partitions"]
    store = ResultsStore(spark, str(tmp_path))
    store.write_metrics(res, "run-1")
    m = store.read_metrics()
    assert m.filter("partition_key IS NULL").count() == len(res.metrics["global"])
    n_parts = len(res.metrics["partitions"])
    assert m.filter("partition_key IS NOT NULL").count() == n_parts * len(res.metrics["global"])
    keys = {r[0] for r in m.select("metric_key").distinct().collect()}
    assert any("column.mean" in k for k in keys)

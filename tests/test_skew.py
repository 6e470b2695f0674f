"""Salting utilities (functions/skew.py) — correctness vs unsalted plans."""

from pyspark.sql import functions as F

from great_expectations_spark.functions import skew


def test_salted_group_agg_matches_plain(spark, lineitem):
    aggs = {
        "cnt": F.count(F.lit(1)),
        "total_qty": F.sum("l_quantity"),
        "min_qty": F.min("l_quantity"),
        "max_qty": F.max("l_quantity"),
    }
    salted = skew.salted_group_agg(
        lineitem, ["l_returnflag"], aggs, buckets=8, id_expr=F.col("l_orderkey")
    )
    plain = lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").alias("total_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b


def test_salted_distinct_count_exact(spark, lineitem):
    got = {
        (r["l_returnflag"], r["distinct_count"])
        for r in skew.salted_distinct_count(
            lineitem, "l_returnflag", "l_partkey", buckets=8
        ).collect()
    }
    want = {
        (r["l_returnflag"], r["dc"])
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("dc"))
        .collect()
    }
    assert got == want


def test_salted_top_values(spark, orders):
    top = skew.salted_top_values(orders, "o_orderstatus", "o_orderpriority", k=2)
    rows = top.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["o_orderstatus"], []).append(r["cnt"])
    for key, cnts in by_key.items():
        assert len(cnts) == 2
        assert cnts == sorted(cnts, reverse=True)
        true_max = (
            orders.filter(F.col("o_orderstatus") == key)
            .groupBy("o_orderpriority")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        assert cnts[0] == true_max


def test_salted_group_agg_rejects_non_algebraic(spark, lineitem):
    import pytest

    with pytest.raises(ValueError, match="merge combiner"):
        skew.salted_group_agg(
            lineitem, ["l_returnflag"], {"m": F.avg("l_quantity")}, buckets=4
        )
    with pytest.raises(ValueError, match="merge combiner"):
        skew.salted_group_agg(
            lineitem,
            ["l_returnflag"],
            {"d": F.count_distinct("l_partkey")},
            buckets=4,
        )


def test_salted_group_agg_explicit_pair(spark, lineitem):
    """avg decomposes as an explicit (partial, merge) pair via sum+count."""
    out = skew.salted_group_agg(
        lineitem,
        ["l_returnflag"],
        {
            "s": F.sum("l_quantity"),
            "n": F.count("l_quantity"),
        },
        buckets=8,
        id_expr=F.col("l_orderkey"),
    ).selectExpr("l_returnflag", "s / n AS mean_qty")
    plain = lineitem.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("mean_qty"))
    a = {(r[0], round(r[1], 9)) for r in out.collect()}
    b = {(r[0], round(r[1], 9)) for r in plain.collect()}
    assert a == b
    # explicit (partial, merge) form for a holistic-looking merge
    out2 = skew.salted_group_agg(
        lineitem,
        ["l_returnflag"],
        {"flags": (F.collect_set("l_linestatus"), F.array_distinct(F.flatten(F.collect_list("flags"))))},
        buckets=4,
        id_expr=F.col("l_orderkey"),
    )
    got = {r["l_returnflag"]: sorted(r["flags"]) for r in out2.collect()}
    want = {
        r["l_returnflag"]: sorted(r["s"])
        for r in lineitem.groupBy("l_returnflag").agg(F.collect_set("l_linestatus").alias("s")).collect()
    }
    assert got == want

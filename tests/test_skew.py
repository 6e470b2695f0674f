"""Salting utilities (functions/skew.py) — correctness vs unsalted plans."""

import pytest
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


def test_salted_group_agg_refuses_composite_expressions(spark):
    """max(x)-min(x) per-salt partials must NOT merge with the inner
    function's combiner — the probe requires a single root aggregate call."""
    from pyspark.sql import functions as F

    from great_expectations_spark.functions.skew import salted_group_agg

    df = spark.createDataFrame([("k", 0), ("k", 1), ("k", 100), ("k", 101)], ["k", "x"])
    with pytest.raises(ValueError, match="merge combiner"):
        salted_group_agg(df, ["k"], {"range": F.max("x") - F.min("x")}, buckets=4)
    with pytest.raises(ValueError, match="merge combiner"):
        salted_group_agg(df, ["k"], {"neg": F.max("x") * -1}, buckets=4)
    # explicit (partial, merge) pair is the supported route
    out = salted_group_agg(
        df, ["k"],
        {"mx": (F.max("x"), F.max("mx")), "mn": (F.min("x"), F.min("mn"))},
        buckets=4,
    ).collect()[0]
    assert out["mx"] - out["mn"] == 101


def test_salted_top_values_two_phase(spark):
    """Top-k survives the two-phase (salt-local then global) rewrite: exact
    counts and exact top ordering."""
    from great_expectations_spark.functions.skew import salted_top_values

    rows = (
        [("hot", f"v{i}") for i in range(50)]          # 50 singleton values
        + [("hot", "a")] * 30 + [("hot", "b")] * 20
        + [("cold", "z")] * 3
    )
    df = spark.createDataFrame(rows, ["k", "v"])
    out = salted_top_values(df, "k", "v", k=2, buckets=8).collect()
    top = {(r["k"], r["v"]): r["cnt"] for r in out}
    assert top[("hot", "a")] == 30 and top[("hot", "b")] == 20
    assert top[("cold", "z")] == 3
    assert len([r for r in out if r["k"] == "hot"]) == 2

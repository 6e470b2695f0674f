"""Explicit skew handling — salting utilities (north rule: "explicit
repartition/salting for skewed fmt/size buckets").

Counts and other algebraic aggregates don't need salting (map-side partial
aggregation absorbs hot keys); the cases that DO are holistic per-key state:
collect_list/collect_set, exact distinct-per-key, and joins whose build side
has heavy-hitter keys (AQE skew-join covers sort-merge joins at runtime —
`spark.sql.adaptive.skewJoin.enabled` is set in our sessions — but
aggregation-state skew needs the two-phase rewrite below).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, buckets: int = 16, id_expr: Column | None = None) -> DataFrame:
    """Add a deterministic salt column in [0, buckets): hash-derived from
    ``id_expr`` when given (reproducible), else spark_partition_id-mixed
    monotonically-increasing ids (stable within a run)."""
    if id_expr is not None:
        salt = F.pmod(F.hash(id_expr), F.lit(buckets))
    else:
        salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets))
    return df.withColumn(SALT_COL, salt)


def salted_group_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    buckets: int = 16,
    id_expr: Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation for ALGEBRAIC aggregates:
    groupBy(keys + salt) partial → groupBy(keys) merge. A key with 10^9 rows
    becomes `buckets` partial states instead of one reducer's full stream.

    ``aggs``: alias -> first-phase aggregate expression; the merge phase
    re-aggregates by alias with the matching combiner (sum→sum, count→sum,
    min→min, max→max) inferred from the expression name.
    """
    first = df if SALT_COL in df.columns else with_salt(df, buckets, id_expr)
    phase1 = first.groupBy(*keys, SALT_COL).agg(
        *[e.alias(a) for a, e in aggs.items()]
    )
    mergers = []
    for a, e in aggs.items():
        name = e._jc.toString().lower() if hasattr(e, "_jc") else ""
        if name.startswith("min"):
            mergers.append(F.min(a).alias(a))
        elif name.startswith("max"):
            mergers.append(F.max(a).alias(a))
        else:  # count/sum both merge by sum
            mergers.append(F.sum(a).alias(a))
    return phase1.groupBy(*keys).agg(*mergers)


def salted_distinct_count(
    df: DataFrame, key: str, value: str, buckets: int = 16
) -> DataFrame:
    """Exact distinct-count-per-key that never funnels one key's values into
    a single task: salt by the VALUE hash → per-(key, salt) distinct partials
    → sum. → (key, distinct_count)."""
    salted = df.withColumn(SALT_COL, F.pmod(F.hash(F.col(value)), F.lit(buckets)))
    partial = (
        salted.groupBy(key, SALT_COL)
        .agg(F.count_distinct(F.col(value)).alias("_dc"))
    )
    # value-hash salting puts each distinct value in exactly one bucket, so
    # bucket partials are disjoint and sum exactly
    return partial.groupBy(key).agg(F.sum("_dc").alias("distinct_count"))


def salted_top_values(
    df: DataFrame, key: str, value: str, k: int = 10, buckets: int = 16
) -> DataFrame:
    """Top-k values per key under skew: counts are salt-partial-aggregated
    (algebraic, safe), then ranked per key. → (key, value, cnt) rows."""
    counts = (
        df.groupBy(key, value).agg(F.count(F.lit(1)).alias("cnt"))
    )  # groupBy is already two-phase for counts; rank with a bounded window
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.desc("cnt"), F.asc(value))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )

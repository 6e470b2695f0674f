"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline — one scan, JVM-side
  zip_with/aggregate dot products, no UDF
- LSH-bucketed (random hyperplane signs) top-k: the scale path — candidates
  from matching sign-bucket, exact re-rank inside the bucket
- near-duplicate pairs by cosine ≥ τ: LSH-bucketed self-join

Scale notes: the query vector folds into the plan as a literal array
(broadcast by value). For top-k, ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject — per-partition heaps, no global sort.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_array(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Embedding tables often arrive as one small file partition — cosine
    math would then run on one core. Repartition up to default parallelism
    when underpartitioned (no-op on well-partitioned tables)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key)
    return df


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, TakeOrderedAndProject (no full sort)."""
    q = _lit_array(query_vec)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    sim = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))
    return (
        _ensure_parallelism(df, id_col)
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---- random-hyperplane LSH ----------------------------------------------


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign pattern across hyperplanes packed into a long — the bucket id.

    Dot products are JVM-side (zip_with against literal plane arrays)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(vec_col, _lit_array(plane.tolist()))
        bucket = bucket.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    multi_probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: prune to rows whose LSH bucket is within
    `multi_probe_hamming` bits of the query's bucket, then exact re-rank.

    At scale the bucket column is precomputed+partitioned (bucket pruning →
    file pruning on Iceberg); here it folds into one scan."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    signs = planes @ np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, s in enumerate(signs):
        if s >= 0:
            qbucket |= 1 << i
    bucket = lsh_bucket(F.col(vec_col), planes)
    probe = F.bit_count(bucket.bitwiseXOR(F.lit(qbucket))) <= multi_probe_hamming
    q = _lit_array(query_vec)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    sim = dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))
    return (
        _ensure_parallelism(df, id_col)
        .filter(probe)
        .select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs with cosine ≥ τ: same-LSH-bucket self-join → exact
    verify. High τ ⇒ high bucket-collision probability ((1 - θ/π)^n per
    plane set), so recall stays high while the join touches only same-bucket
    pairs (quadratic only within buckets; AQE skew-splits hot buckets)."""
    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    # norm computed once per VECTOR here, not once per pair in the join
    with_bucket = _ensure_parallelism(df, id_col).select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        norm(F.col(vec_col)).alias("_n"),
    )
    left = with_bucket.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket", F.col("_n").alias("na")
    )
    right = with_bucket.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket", F.col("_n").alias("nb")
    )
    pairs = left.join(right, "bucket").filter(F.col("a") < F.col("b"))
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("a", "b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["a", "b"])
    )


def brute_force_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine ≥ τ (oracle/baseline; quadratic — small inputs
    only)."""
    df = _ensure_parallelism(df, id_col).select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n")
    )
    left = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), F.col("_n").alias("na"))
    right = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), F.col("_n").alias("nb"))
    pairs = left.crossJoin(right).filter(F.col("a") < F.col("b"))
    sim = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select("a", "b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )

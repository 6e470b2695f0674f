"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline — one scan, JVM-side
  zip_with/aggregate dot products, no UDF
- LSH-bucketed (random hyperplane signs) top-k: candidates from matching
  sign-bucket, exact re-rank inside the bucket
- IVF (inverted-file) top-k: spherical-kmeans coarse quantizer trained on a
  bounded sample, vectors assigned to centroid lists in one Arrow pass,
  queries scan only the n_probe nearest lists — the scale path when the
  assigned table is clustered by centroid_id (probe → partition/file prune)
- PQ (product-quantization) top-k: per-subspace codebooks compress each
  vector to m narrow ints (~192x for 768-dim float32 at m=8/k=256); asymmetric-
  distance scoring folds the query→centroid lookup tables into the plan as
  literal arrays — the query path is PURE CODEGEN over the code column,
  the raw vectors are never read again after encoding
- near-duplicate pairs by cosine ≥ τ: LSH-bucketed self-join

Scale notes: the query vector folds into the plan as a literal array
(broadcast by value). For top-k, ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject — per-partition heaps, no global sort.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_array(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


from great_expectations_spark.operators.dedup import _ensure_parallelism


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
    """NULL (not an ANSI DIVIDE_BY_ZERO crash) when either vector has zero
    norm — cosine is undefined there; callers drop the nulls."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def _require_query_norm(query_vec) -> float:
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    if qn == 0.0:
        raise ValueError("query vector has zero norm — cosine is undefined")
    return qn


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, TakeOrderedAndProject (no full sort)."""
    q = _lit_array(query_vec)
    qn = _require_query_norm(query_vec)
    sim = F.try_divide(dot(F.col(vec_col), q), norm(F.col(vec_col)) * F.lit(qn))
    return (
        _ensure_parallelism(df, id_col)
        .select(F.col(id_col), sim.alias("cosine"))
        .filter(F.col("cosine").isNotNull())  # zero-norm rows: undefined
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
    qn = _require_query_norm(query_vec)
    sim = F.try_divide(dot(F.col(vec_col), q), norm(F.col(vec_col)) * F.lit(qn))
    return (
        _ensure_parallelism(df, id_col)
        .filter(probe)
        .select(F.col(id_col), sim.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
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
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs with cosine ≥ τ: same-LSH-bucket self-join → exact
    verify. High τ ⇒ high bucket-collision probability ((1 - θ/π)^n per
    plane set), so recall stays high while the join touches only same-bucket
    pairs (quadratic only within buckets; AQE skew-splits hot buckets).

    ``dim`` skips the dimension-probe job; without it the first NON-NULL
    embedding is probed (raises a clear error on an all-null/empty table)."""
    if dim is None:
        row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
        if row is None:
            raise ValueError(
                "no non-null embeddings to infer the dimension from — pass dim="
            )
        dim = len(row[0])
    planes = hyperplanes(dim, n_planes, seed)
    # norm computed once per VECTOR here, not once per pair in the join
    with_bucket = _ensure_parallelism(
        df.filter(F.col(vec_col).isNotNull()), id_col
    ).select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        norm(F.col(vec_col)).alias("_n"),
    )
    # self-join via alias with renames ABOVE the join: identical join-input
    # subtrees let AQE reuse the shuffle exchange, so the bucket/norm
    # projection (n_planes dot products per row) is computed once, not once
    # per side (see dedup.simhash_near_pairs for the measured 2× effect)
    pairs = (
        with_bucket.alias("l")
        .join(with_bucket.alias("r"), "bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col(f"l.{vec_col}").alias("va"),
            F.col(f"r.{vec_col}").alias("vb"),
            F.col("l._n").alias("na"),
            F.col("r._n").alias("nb"),
        )
    )
    sim = F.try_divide(dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb"))
    # no pair-dedup pass: each vector hashes to exactly ONE bucket (single
    # concatenated-sign key), so a pair can collide at most once — unlike
    # the multi-band simhash path, where band collisions duplicate pairs
    # and the dropDuplicates shuffle is load-bearing
    return (
        pairs.select("a", "b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
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
    sim = F.try_divide(dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb"))
    return pairs.select("a", "b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


# ---- IVF (inverted-file) ANN ---------------------------------------------

def _bounded_vector_sample(
    df: DataFrame, vec_col: str, sample_size: int, seed: int, what: str
) -> np.ndarray:
    """Seeded bounded sample of non-null vectors as a (n, d) float64 array —
    the only driver-side data either quantizer trainer touches."""
    base = df.select(vec_col).filter(F.col(vec_col).isNotNull())
    n = base.count()
    if n == 0:
        raise ValueError(f"no non-null embeddings to train {what} on")
    sample = base
    if n > sample_size:
        sample = base.sample(
            fraction=min(1.0, 1.2 * sample_size / n), seed=seed
        ).limit(sample_size)
    return np.array([r[0] for r in sample.collect()], dtype=np.float64)


def _probe_lists(
    centroids: np.ndarray, query_vec: Sequence[float], n_probe: int
) -> list[int]:
    """The n_probe coarse-centroid ids nearest the query by cosine."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = _require_query_norm(query_vec)
    order = (
        np.ascontiguousarray(centroids, dtype=np.float64) @ (q / qn)
    ).argsort()[::-1]
    return [int(c) for c in order[:n_probe]]




def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 64,
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means centroids from a bounded seeded sample — the IVF
    coarse quantizer. The sample is the only driver-side data (≤ sample_size
    vectors); training is numpy matrix math. Returns (n_centroids, dim)
    L2-normalized centroids, deterministic given (data, seed)."""
    X = _bounded_vector_sample(df, vec_col, sample_size, seed, "IVF centroids")
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(n_centroids, len(X))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        # spherical k-means: assign by max dot, re-estimate, re-normalize
        assign = (X @ C.T).argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``centroid_id`` = argmax cosine(vector, centroid) — one Arrow
    pass (batch matrix multiply per Arrow batch; centroids ride the closure
    as a broadcast-by-value constant). At scale the assigned table is
    written partitioned/clustered BY centroid_id so probes prune files."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            vals = series.tolist()
            out = np.full(len(vals), -1, dtype=np.int32)  # nulls -> list -1
            valid = [i for i, v in enumerate(vals) if v is not None]
            if valid:
                M = np.array([vals[i] for i in valid], dtype=np.float64)
                M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                out[valid] = (M @ C.T).argmax(axis=1).astype(np.int32)
            yield pd.Series(out)

    return _ensure_parallelism(df, id_col).withColumn(
        "centroid_id", assign_udf(F.col(vec_col))
    )


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query, scan only the
    ``n_probe`` nearest inverted lists (``centroid_id IN probes`` — a
    partition-pruning filter on a table clustered by centroid_id), exact
    cosine re-rank inside via TakeOrderedAndProject."""
    probes = _probe_lists(centroids, query_vec, n_probe)
    qn = _require_query_norm(query_vec)
    ql = _lit_array(query_vec)
    sim = F.try_divide(dot(F.col(vec_col), ql), norm(F.col(vec_col)) * F.lit(qn))
    return (
        indexed.filter(F.col("centroid_id").isin(probes))
        .select(F.col(id_col), sim.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# ---- PQ (product quantization) ANN ----------------------------------------


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace k-means codebooks for product quantization (Jégou,
    Douze, Schmid 2011, "Product Quantization for Nearest Neighbor
    Search" — public literature): the d-dim space splits into ``m``
    contiguous blocks of d/m dims; each block gets its own ``k``-centroid
    codebook trained on a bounded seeded sample (the only driver-side
    data). Returns (m, k', d/m) float64, deterministic given (data, seed).

    PQ is the 100-TB memory lever the coarse IVF quantizer is not: an
    encoded vector is ``m`` narrow ints (pq_encode picks tinyint up to
    k=128, smallint up to 32768 — 16 logical bytes for m=8/k=256 vs 3072
    for 768-dim float32, ~192x before parquet dictionary encoding) and the
    scoring scan reads only the code column."""
    if m < 1:
        raise ValueError("m must be >= 1")
    X = _bounded_vector_sample(df, vec_col, sample_size, seed, "PQ codebooks")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} is not divisible by m={m}")
    ds = d // m
    kk = min(k, len(X))
    rng = np.random.default_rng(seed)
    books = np.empty((m, kk, ds), dtype=np.float64)
    for j in range(m):
        Xj = X[:, j * ds : (j + 1) * ds]
        C = Xj[rng.choice(len(Xj), size=kk, replace=False)].copy()
        for _ in range(iters):
            # plain Lloyd: nearest centroid by L2, empty clusters keep
            # their previous centroid (stable, deterministic). Distance via
            # the expansion ||c||^2 - 2 x.c (||x||^2 is argmin-constant per
            # row) — the broadcast temp (n, k, ds) of the naive form is
            # ~4 GB at defaults for 768-dim input; this is (n, k) ~40 MB,
            # the same identity pq_encode uses
            scores = (C ** 2).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
            assign = scores.argmin(axis=1)
            for c in range(kk):
                members = Xj[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Add ``out_col`` = array<int>(m) of nearest-centroid indices per
    block — one Arrow pass (batched matrix math per block; codebooks ride
    the closure broadcast-by-value). NULL embedding → NULL code. At scale
    the encoded table persists WITHOUT the raw vector column — scoring
    never reads it."""
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, ds = B.shape
    # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is rank-constant
    cn = (B ** 2).sum(axis=2)  # (m, k)
    # narrowest element type the codebook size allows — the whole point of
    # PQ is code-table bytes (signed types: tinyint caps at k=128)
    code_type = (
        "array<tinyint>" if kk <= 128
        else "array<smallint>" if kk <= 32768
        else "array<int>"
    )

    @F.pandas_udf(code_type)
    def encode_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in it:
            vals = series.tolist()
            out: list = [None] * len(vals)
            valid = [i for i, v in enumerate(vals) if v is not None]
            if valid:
                M = np.array([vals[i] for i in valid], dtype=np.float64)
                if M.shape[1] != m * ds:
                    raise ValueError(
                        f"embedding dim {M.shape[1]} != codebook dim {m * ds}"
                        " — codebooks were trained on a different space"
                    )
                codes = np.empty((len(valid), m), dtype=np.int32)
                for j in range(m):
                    Xj = M[:, j * ds : (j + 1) * ds]
                    codes[:, j] = (cn[j][None, :] - 2.0 * (Xj @ B[j].T)).argmin(
                        axis=1
                    )
                for row, i in enumerate(valid):
                    out[i] = codes[row].tolist()
            yield pd.Series(out)

    return _ensure_parallelism(df, id_col).withColumn(
        out_col, encode_udf(F.col(vec_col))
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance (ADC) cosine top-k over PQ codes — NO UDF in the
    query path: the per-block lookup tables (query-subvector · centroid,
    and centroid squared norms) fold into the plan as literal arrays, the
    score is a codegen'd sum of ``element_at`` terms over the code array,
    and ``orderBy().limit(k)`` compiles to TakeOrderedAndProject
    (per-partition heaps). cosine(q, v̂) where v̂ is the PQ reconstruction:
    Σ_j lut_dot[j][code_j] / (sqrt(Σ_j lut_sq[j][code_j]) · |q|) — EXACT
    equality with brute-force cosine whenever vectors are codebook-
    representable (pinned by tests), recall-graded otherwise."""
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, kk, ds = B.shape
    q = np.asarray(query_vec, dtype=np.float64)
    if q.shape[0] != m * ds:
        raise ValueError(f"query dim {q.shape[0]} != codebook dim {m * ds}")
    qn = _require_query_norm(query_vec)
    code = F.col(code_col)
    dot_acc = None
    sq_acc = None
    for j in range(m):
        lut_dot = _lit_array(B[j] @ q[j * ds : (j + 1) * ds])
        lut_sq = _lit_array((B[j] ** 2).sum(axis=1))
        cj = F.element_at(code, j + 1) + F.lit(1)  # element_at is 1-indexed
        dterm = F.element_at(lut_dot, cj)
        sterm = F.element_at(lut_sq, cj)
        dot_acc = dterm if dot_acc is None else dot_acc + dterm
        sq_acc = sterm if sq_acc is None else sq_acc + sterm
    sim = F.try_divide(dot_acc, F.sqrt(sq_acc) * F.lit(qn))
    return (
        encoded.filter(code.isNotNull())
        .select(F.col(id_col), sim.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    indexed_codes: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """IVF-PQ: the standard billion-scale ANN composition (Jégou et al.
    2011) — prune to the ``n_probe`` nearest inverted lists (a
    partition-pruning ``centroid_id IN`` filter on a table clustered by
    centroid_id), then rank the survivors by PURE-codegen asymmetric PQ
    distance. Input is ``ivf_assign`` + ``pq_encode`` output persisted
    WITHOUT the raw vectors: the scan reads (id, centroid_id, m-int code)
    only — at 10^12 vectors neither the probe filter nor the scorer ever
    touches a float embedding."""
    probes = _probe_lists(centroids, query_vec, n_probe)
    return pq_topk(
        indexed_codes.filter(F.col("centroid_id").isin(probes)),
        codebooks,
        query_vec,
        k=k,
        id_col=id_col,
        code_col=code_col,
    )

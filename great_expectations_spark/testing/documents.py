"""Deterministic distributed synthetic documents — generated entirely with
Catalyst expressions (hash/pmod/transform/concat_ws), so corpus construction
scales with the cluster and never touches the driver or Python workers.

Corpus shape: zipf-ish vocabulary draws; every 31st doc is a near-duplicate
of its predecessor (same word sequence + one extra token) and every 97th an
exact duplicate — ground truth for dedup benchmarks at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def distributed_documents_df(
    spark: SparkSession,
    n: int,
    partitions: int = 64,
    vocab_size: int = 800,
    min_words: int = 30,
    max_words: int = 120,
    seed: int = 42,
) -> DataFrame:
    """(doc_id long, text string) — deterministic for a given (n, seed)."""
    base = spark.range(0, n, 1, partitions).withColumnRenamed("id", "doc_id")
    # exact dup every 97th (copies previous doc), near-dup every 31st
    src = (
        F.when(F.col("doc_id") % 97 == 0, F.col("doc_id") - 1)
        .when(F.col("doc_id") % 31 == 0, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )
    src = F.greatest(src, F.lit(0))
    n_words = (
        F.pmod(F.hash(src, F.lit(seed)), F.lit(max_words - min_words)) + F.lit(min_words)
    )
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        # square the inner hash to skew the distribution zipf-ward
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(
                F.pmod(F.hash(src, i, F.lit(seed)), F.lit(vocab_size))
                * F.pmod(F.hash(src, i, F.lit(seed + 1)), F.lit(vocab_size)),
                F.lit(vocab_size),
            ).cast("string"),
        ),
    )
    text = F.concat_ws(" ", words)
    # near-dups get one extra marker token (jaccard just below 1)
    text = F.when(
        (F.col("doc_id") % 31 == 0) & (F.col("doc_id") % 97 != 0) & (F.col("doc_id") > 0),
        F.concat(text, F.lit(" extra"), F.col("doc_id").cast("string")),
    ).otherwise(text)
    return base.select("doc_id", text.alias("text"))

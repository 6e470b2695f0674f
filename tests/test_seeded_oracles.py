"""Differential tests for the pure-Python seeded-hash oracles
(testing/seeded_oracles.py): the engine pipelines (minhash+LSH, simhash
banding, hyperplane-LSH top-k) run on SYNTHETIC fixtures written to tmp
parquet, and the oracle recomputes the expected rows single-node; the two
must agree exactly. Also pins the param_ks verdict margins on the real
sf0.01 fixtures so a distribution shift that brings either leg near the
0.001 threshold fails loudly instead of flaking the driver gate.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from great_expectations_spark.operators import dedup as dd
from great_expectations_spark.operators import similarity as sim
from great_expectations_spark.testing import seeded_oracles as so

SF001 = "/root/testdata/sf0.01"


def _write_documents(path: str) -> None:
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "machine learning pipelines need careful data validation at scale",
        "spark executes declarative plans with catalyst and tungsten engines",
        "a completely different sentence about cooking pasta with tomatoes",
    ]
    rows = []
    doc_id = 0
    for b in base:
        # planted near-dup clusters: identical, one-word edit, word swap
        for variant in (b, b, b.replace("the", "a", 1), b + " extra tail words"):
            rows.append((doc_id, variant))
            doc_id += 1
    for i in range(24):  # unique fillers
        rows.append((doc_id, f"unique filler document number {i} with payload {i*i}"))
        doc_id += 1
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, os.path.join(path, "documents.parquet"))


def _write_embeddings(path: str, n: int = 80, dim: int = 16, seed: int = 3) -> None:
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    # make a few rows near the query (vec_id 0) so top-k is non-trivial
    for i in range(1, 6):
        vecs[i] = vecs[0] + rng.standard_normal(dim).astype(np.float32) * 0.1
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    pq.write_table(t, os.path.join(path, "embeddings.parquet"))


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seeded_oracle_fixtures"))
    _write_documents(d)
    _write_embeddings(d)
    return d


def _duck_rows(sql: str) -> set[tuple]:
    return set(map(tuple, duckdb.connect().execute(sql).fetchall()))


def test_minhash_oracle_matches_engine(spark, fixture_dir):
    docs = spark.read.parquet(os.path.join(fixture_dir, "documents.parquet"))
    got = {
        (r["a"], r["b"], r["est_jaccard"])
        for r in dd.minhash_dedup_pairs(docs, threshold=0.5)
        .select("a", "b", F.round("est_jaccard", 6).alias("est_jaccard"))
        .collect()
    }
    expected = _duck_rows(so.minhash_pairs_sql(fixture_dir, threshold=0.5))
    assert expected, "synthetic corpus must produce near-dup pairs"
    assert got == expected


def test_simhash_oracle_matches_engine(spark, fixture_dir):
    docs = spark.read.parquet(os.path.join(fixture_dir, "documents.parquet"))
    sigs = dd.simhash_signatures(docs)
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in dd.simhash_near_pairs(sigs, max_hamming=8).collect()
    }
    expected = _duck_rows(so.simhash_pairs_sql(fixture_dir, max_hamming=8))
    assert expected, "synthetic corpus must produce simhash near-pairs"
    assert got == expected


def test_lsh_topk_oracle_matches_engine(spark, fixture_dir):
    emb = spark.read.parquet(os.path.join(fixture_dir, "embeddings.parquet"))
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in sim.lsh_topk(
            emb.filter(F.col("vec_id") != 0), qv, k=10, n_planes=8,
            multi_probe_hamming=2,
        )
        .select("vec_id", F.round("cosine", 4).alias("cosine"))
        .collect()
    ]
    expected_sql = so.lsh_topk_sql(fixture_dir, k=10, n_planes=8, multi_probe_hamming=2)
    expected = duckdb.connect().execute(expected_sql).fetchall()
    assert len(got) == len(expected) > 0
    assert set(got) == set(map(tuple, expected))


def test_param_ks_margins():
    """Both legs must sit ≥10× away from the 0.001 verdict threshold — the
    GK sketch's quantile error moves the engine's p-value by well under that,
    so engine and exact-oracle verdicts cannot disagree."""
    bits = so.param_ks_success_bits(SF001)
    assert [(n, b) for n, b, _ in bits] == [
        ("param_ks_uniform", 0),
        ("param_ks_hash_uniform", 1),
    ]
    p_fail = bits[0][2]
    p_pass = bits[1][2]
    assert p_fail < 1e-4  # 0.001 / 10
    assert p_pass > 1e-2  # 0.001 * 10


def test_values_sql_empty_rows():
    from great_expectations_spark.testing.oracles import values_sql

    sql = values_sql([], [("a", "BIGINT"), ("x", "DOUBLE")])
    cols, rows = zip(
        *[
            (d[0], None)
            for d in duckdb.connect().execute(sql).description
        ]
    )
    assert list(cols) == ["a", "x"]
    assert duckdb.connect().execute(sql).fetchall() == []

"""Bit-for-bit verification of testing/hashes.py (pure-Python XXH64 and
Spark-variant Murmur3_x86_32) against the live JVM implementations
(F.xxhash64 / F.hash). These two functions are the foundation of the
pure-Python VALUES oracles for the seeded-hash queries (dedup_minhash,
dedup_simhash) — if they drift from Spark by one bit the oracles are
meaningless, so the test sweeps all input lengths mod 8/4 (both hash
algorithms branch on length remainders), high-bit bytes (Java sign
extension), unicode, and embedded NULs.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from great_expectations_spark.testing.hashes import (
    spark_hash_string,
    spark_murmur3_32,
    spark_xxhash64_string,
    xxh64,
)


def _cases() -> list[str]:
    rng = random.Random(20260819)
    cases = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "hello world",
        " leading and trailing ",
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "y" * 63,
        "y" * 64,
        "z" * 100,
        "naïve café — déjà vu ✓ 你好 🚀",  # multi-byte UTF-8
        "tab\tnewline\nnul\x00end",
        "-9223372036854775808,42,0,7",  # the band-key concat shape
    ]
    alphabet = (
        "abcdefghijklmnopqrstuvwxyz0123456789 ,-_/:é中🦀"
        + "".join(chr(c) for c in range(0x80, 0x90))
    )
    for n in range(0, 70):  # every length mod 8 and mod 4, several times over
        cases.append("".join(rng.choice(alphabet) for _ in range(n)))
    return cases


def test_hashes_match_spark_bit_for_bit(spark):
    cases = _cases()
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = df.select(
        "s", F.xxhash64("s").alias("xx"), F.hash("s").alias("mm")
    ).collect()
    assert len(got) == len(cases)
    for row in got:
        assert spark_xxhash64_string(row["s"]) == row["xx"], repr(row["s"])
        assert spark_hash_string(row["s"]) == row["mm"], repr(row["s"])


def test_hashes_match_spark_on_longs(spark):
    """F.xxhash64 / F.hash over LONG columns hash the 8 little-endian bytes —
    the shape _hamming_band_exprs uses (xxhash64(lit, long, long))."""
    vals = [0, 1, -1, 42, -42, 2**63 - 1, -(2**63), 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.select("v", F.xxhash64("v").alias("xx"), F.hash("v").alias("mm")).collect()
    for row in got:
        le = (row["v"] & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
        assert xxh64(le, 42) == row["xx"], row["v"]
        assert spark_murmur3_32(le, 42) == row["mm"], row["v"]

"""Pure-Python VALUES oracles for the seeded-hash / approximate driver
queries (dedup_minhash, dedup_simhash, sim_lsh_topk, param_ks).

These four pipelines hash with Spark's xxhash64/murmur3 and therefore can't
be expressed in DuckDB SQL directly. Instead, each function here recomputes
the expected output INDEPENDENTLY — plain Python/numpy over the parquet
fixtures read with pyarrow, no Spark, no engine operator code — and emits it
as a DuckDB ``SELECT ... FROM (VALUES ...)`` statement, the same strategy the
image/audio/video oracles use (testing/oracles.py). The JVM hash functions
are re-derived from their public specs in testing/hashes.py and verified
bit-for-bit in tests/test_testing_hashes.py.

The only things shared with the engine are algorithm PARAMETERS (permutation
constants, hyperplane RNG seed) — re-derived here from their definitions, not
imported — so a bug anywhere in the distributed pipeline (shingling, banding,
the self-join, signature aggregation, bucket pruning, top-k ordering) shows
up as an oracle mismatch.
"""

from __future__ import annotations

import math
import os
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow.parquet as pq

from great_expectations_spark.testing.hashes import (
    spark_hash_string,
    spark_xxhash64_string,
    xxh64,
)
from great_expectations_spark.testing.oracles import values_sql

_SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def _sf_dir(sf_dir: str | None) -> str:
    return sf_dir or os.environ.get("SF_DIR", _SF_DIR_DEFAULT)


def _round_half_up(v: float, digits: int) -> float:
    """Spark's F.round(double, d): HALF_UP over the double's SHORTEST decimal
    repr (BigDecimal.valueOf -> Double.toString), not its exact binary
    expansion: round(2.675, 2) is 2.68 in Spark because "2.675" rounds up,
    while the stored double 2.67499999...9 would round down. Python's repr()
    is the same shortest-repr algorithm, so Decimal(repr(v)) reproduces it."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP))


# ---- text fixtures ---------------------------------------------------------

# Java regex \s is ASCII-only — [ \t\n\x0B\f\r] — unlike Python's str \s.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _normalize(text: str) -> str:
    """Replica of operators/text.py normalize_text semantics: Spark F.trim
    strips SPACE (0x20) only; lower is plain ASCII-safe lowercasing (the
    document fixtures are pure ASCII); \\s+ is the Java character class."""
    return _JAVA_WS.sub(" ", text.strip(" ").lower())


def _documents(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


# ---- minhash + banded LSH --------------------------------------------------


def _permutation_constants(num_hashes: int, seed: int = 1_000_003):
    """Splitmix-ish (xor_pre, rot, xor_post) triples — the published
    constant-derivation of the engine's permutation family, re-derived from
    its definition (LCG 6364136223846793005/1442695040888963407, rot
    (i*37) % 63 + 1)."""
    m = (1 << 64) - 1
    out = []
    x = seed & m
    for i in range(num_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) & m
        a = x
        x = (x * 6364136223846793005 + 1442695040888963407) & m
        b = x
        out.append((a, (i * 37) % 63 + 1, b))
    return out


def _minhash_signature(text: str, consts, shingle_k: int) -> np.ndarray:
    """int64 signature vector: min over shingles of rot(h^a, r)^b.

    Shingle positions follow the engine's sequence(1, greatest(len-k+1, 1)):
    a doc shorter than k contributes its whole text as the one shingle."""
    norm = _normalize(text)
    n_pos = max(len(norm) - shingle_k + 1, 1)
    shingles = {norm[p : p + shingle_k] for p in range(n_pos)}
    th = np.array(
        [spark_xxhash64_string(s) for s in shingles], dtype=np.int64
    ).astype(np.uint64)
    sig = np.empty(len(consts), dtype=np.int64)
    for i, (a, r, b) in enumerate(consts):
        x = th ^ np.uint64(a)
        rotated = (x << np.uint64(r)) | (x >> np.uint64(64 - r))
        sig[i] = (rotated ^ np.uint64(b)).astype(np.int64).min()
    return sig


def minhash_pairs_sql(
    sf_dir: str | None = None,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> str:
    """Expected (a, b, est_jaccard) rows of dedup_minhash: signatures →
    16-band/4-row LSH buckets (band key = Spark murmur3 of the comma-joined
    signature strings, so engine-side 2^-32 bucket collisions reproduce
    exactly) → candidate pairs → matching-position fraction ≥ threshold."""
    docs = _documents(_sf_dir(sf_dir))
    consts = _permutation_constants(num_hashes)
    rows_per_band = num_hashes // bands
    sigs = {
        doc_id: _minhash_signature(text, consts, shingle_k) for doc_id, text in docs
    }
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for band in range(bands):
            key = ",".join(
                str(int(sig[band * rows_per_band + r])) for r in range(rows_per_band)
            )
            buckets.setdefault((band, spark_hash_string(key)), []).append(doc_id)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] != ids[j]:
                    pairs.add((ids[i], ids[j]))
    out = []
    min_matches = threshold * num_hashes
    for a, b in sorted(pairs):
        m = int((sigs[a] == sigs[b]).sum())
        if m >= min_matches:
            # m/num_hashes at num_hashes=64 is exact in 6 decimals
            out.append((a, b, _round_half_up(m / num_hashes, 6)))
    return values_sql(
        out, [("a", "BIGINT"), ("b", "BIGINT"), ("est_jaccard", "DOUBLE")]
    )


# ---- simhash ----------------------------------------------------------------


def simhash_pairs_sql(sf_dir: str | None = None, max_hamming: int = 8) -> str:
    """Expected (a, b, hamming) rows of dedup_simhash. The engine's
    combination banding is pigeonhole-COMPLETE for hamming ≤ max_hamming, so
    the oracle is the stronger statement: ALL-PAIRS hamming ≤ max_hamming
    over independently recomputed signatures — a banding recall bug mismatches
    here even though the engine never compares all pairs."""
    docs = _documents(_sf_dir(sf_dir))
    sigs: dict[int, int] = {}
    for doc_id, text in docs:
        norm = _normalize(text).strip(" ")
        toks = norm.split(" ") if norm else []
        if not toks:
            continue  # explode of an empty token array drops the doc
        votes = np.zeros(64, dtype=np.int64)
        for tok in toks:  # duplicates vote once per occurrence, as exploded
            th = spark_xxhash64_string(tok)
            bits = (np.uint64(th & 0xFFFFFFFFFFFFFFFF) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            votes += bits.astype(np.int64) * 2 - 1
        sig = 0
        for i in range(64):
            if votes[i] > 0:
                sig |= 1 << i
        sigs[doc_id] = sig
    ids = sorted(sigs)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            h = bin(sigs[ids[i]] ^ sigs[ids[j]]).count("1")
            if h <= max_hamming:
                out.append((ids[i], ids[j], h))
    return values_sql(out, [("a", "BIGINT"), ("b", "BIGINT"), ("hamming", "INTEGER")])


# ---- embedding LSH top-k -----------------------------------------------------


def _embeddings(sf_dir: str) -> list[tuple[int, list[float]]]:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # float32 elements widened to exact doubles, as Spark's cast("double") does
    return [
        (vid, [float(x) for x in emb])
        for vid, emb in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    ]


def _fold_dot(xs: list[float], ys: list[float]) -> float:
    """Left-fold accumulation — F.aggregate's evaluation order, bit-exact."""
    acc = 0.0
    for x, y in zip(xs, ys):
        acc += x * y
    return acc


def lsh_topk_sql(
    sf_dir: str | None = None,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multi_probe_hamming: int = 2,
) -> str:
    """Expected (vec_id, cosine) rows of sim_lsh_topk: hyperplane sign
    buckets (same published RNG stream: default_rng(42).standard_normal),
    multi-probe hamming prune, exact cosine re-rank, desc/asc-id top-k.

    All float arithmetic replicates the engine's left-fold order so raw
    doubles are bit-identical before the 4-decimal rounding."""
    vecs = _embeddings(_sf_dir(sf_dir))
    query = next(v for vid, v in vecs if vid == 0)
    dim = len(query)
    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    plane_lists = [p.tolist() for p in planes]
    signs = planes @ np.asarray(query, dtype=np.float64)
    qbucket = 0
    for i, s in enumerate(signs):
        if s >= 0:
            qbucket |= 1 << i
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    scored = []
    for vid, v in vecs:
        if vid == 0:
            continue
        bucket = 0
        for i, plane in enumerate(plane_lists):
            if _fold_dot(v, plane) >= 0:
                bucket |= 1 << i
        if bin(bucket ^ qbucket).count("1") > multi_probe_hamming:
            continue
        denom = math.sqrt(_fold_dot(v, v)) * qn
        if denom == 0.0:
            continue  # try_divide → NULL, filtered
        scored.append((vid, _fold_dot(v, query) / denom))
    scored.sort(key=lambda t: (-t[1], t[0]))
    out = [(vid, _round_half_up(c, 4)) for vid, c in scored[:k]]
    return values_sql(out, [("vec_id", "BIGINT"), ("cosine", "DOUBLE")])


# ---- parameterized KS ---------------------------------------------------------


def _ks_pvalue_asymptotic(d: float, n: int) -> float:
    """Two-sided asymptotic Kolmogorov p-value (Stephens' small-sample
    correction), the standard published formula — implemented here rather
    than imported from functions/stats.py so the oracle's verdict is
    engine-independent."""
    if d <= 0:
        return 1.0
    lam = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    s = 0.0
    for j in range(1, 101):
        s += (-1) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
    return max(0.0, min(1.0, 2.0 * s))


def _exact_ks_uniform(values: np.ndarray, lo: float, rng: float) -> tuple[float, int]:
    x = np.sort(values[~np.isnan(values)])
    n = len(x)
    cdf = np.clip((x - lo) / rng, 0.0, 1.0)
    i = np.arange(1, n + 1)
    d = float(max(np.max(i / n - cdf), np.max(cdf - (i - 1) / n)))
    return d, n

def param_ks_success_bits(sf_dir: str | None = None, p_threshold: float = 0.001):
    """(success bits, margins) for the two param_ks legs, from EXACT
    empirical-CDF KS stats (the engine uses GK-sketch quantile probes; both
    land far from the 0.001 threshold, so the verdicts must agree — the
    margins are asserted in tests/test_seeded_oracles.py)."""
    d = _sf_dir(sf_dir)
    t = pq.read_table(
        os.path.join(d, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    qty = np.asarray(t["l_quantity"].to_pylist(), dtype=np.float64)
    d1, n1 = _exact_ks_uniform(qty, 1.0, 49.0)
    p1 = _ks_pvalue_asymptotic(d1, n1)

    # leg 2: u = xxhash64(l_orderkey, l_linenumber)/2^64 + 0.5 — Spark's
    # multi-column xxhash64 chains the first hash as the second's seed.
    # Spark hashes each column at ITS type's width (IntegerType → the
    # 4-byte path, LongType → 8 bytes), so the byte width must follow the
    # parquet schema: l_linenumber is int32 in the fixtures and hashing it
    # as 8 LE bytes would recompute a completely different u stream than
    # the engine validates (verified bit-for-bit vs F.xxhash64).
    ok = t["l_orderkey"].to_pylist()
    ln = t["l_linenumber"].to_pylist()
    widths = tuple(
        4 if t.schema.field(c).type.bit_width == 32 else 8
        for c in ("l_orderkey", "l_linenumber")
    )
    masks = tuple((1 << (8 * w)) - 1 for w in widths)
    us = np.empty(len(ok), dtype=np.float64)
    for i, (a, b) in enumerate(zip(ok, ln)):
        h1 = xxh64((a & masks[0]).to_bytes(widths[0], "little"), 42)
        h2 = xxh64(
            (b & masks[1]).to_bytes(widths[1], "little"), h1 & ((1 << 64) - 1)
        )
        us[i] = float(h2) / 18446744073709551616.0 + 0.5
    d2, n2 = _exact_ks_uniform(us, 0.0, 1.0)
    p2 = _ks_pvalue_asymptotic(d2, n2)
    return [
        ("param_ks_uniform", int(p1 > p_threshold), p1),
        ("param_ks_hash_uniform", int(p2 > p_threshold), p2),
    ]


def param_ks_sql(sf_dir: str | None = None) -> str:
    rows = [(name, bit) for name, bit, _ in param_ks_success_bits(sf_dir)]
    return values_sql(rows, [("expectation", "VARCHAR"), ("success", "BIGINT")])

"""Pure-Python reimplementations of the two hash functions Spark exposes as
``F.xxhash64`` and ``F.hash`` — used ONLY by the pure-Python oracle layer
(testing/oracles.py) so the driver's DuckDB correctness gate can recompute
seeded-hash pipelines (minhash, simhash, LSH banding) independently of the
engine and of the JVM.

Both algorithms are public specifications:
- XXH64: Yann Collet's xxHash spec (github.com/Cyan4973/xxHash), the exact
  algorithm Spark's ``catalyst/expressions/XXH64`` implements. Spark hashes
  a string column as XXH64(utf8_bytes, seed=42).
- Murmur3 x86_32: Austin Appleby's MurmurHash3, with Spark's documented
  deviation (Murmur3_x86_32.hashUnsafeBytes): TAIL bytes (len % 4) are each
  sign-extended and mixed as a FULL round (mixK1 + mixH1 per byte), unlike
  the reference murmur3 which folds the tail into one k1 without mixH1.
  Spark hashes a string column as murmur3(utf8_bytes, seed=42) and returns
  a signed 32-bit int.

Verified bit-for-bit against a live Spark session in
tests/test_testing_hashes.py (random unicode strings, all lengths mod 8/4).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

# ---- XXH64 ----------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    acc = _rotl64(acc, 31)
    return (acc * _P1) & _M64


def _xxh64_merge_round(acc: int, val: int) -> int:
    acc ^= _xxh64_round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` → SIGNED 64-bit int (matching Spark's long)."""
    seed &= _M64
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            v1 = _xxh64_round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _xxh64_round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _xxh64_round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _xxh64_round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        h = _xxh64_merge_round(h, v1)
        h = _xxh64_merge_round(h, v2)
        h = _xxh64_merge_round(h, v3)
        h = _xxh64_merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k1 = _xxh64_round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl64(h ^ k1, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        k1 = int.from_bytes(data[pos : pos + 4], "little")
        h = (_rotl64(h ^ (k1 * _P1) & _M64, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl64(h ^ (data[pos] * _P5) & _M64, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h


def spark_xxhash64_string(s: str, seed: int = 42) -> int:
    """F.xxhash64(string_col) equivalent: XXH64 over UTF-8 bytes, seed 42."""
    return xxh64(s.encode("utf-8"), seed)


# ---- Murmur3 x86_32, Spark variant ----------------------------------------

_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _C2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def spark_murmur3_32(data: bytes, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashUnsafeBytes → SIGNED 32-bit int.

    Tail bytes are each SIGN-extended and mixed as full rounds — Spark's
    deliberate divergence from reference murmur3."""
    h1 = seed & _M32
    n = len(data)
    aligned = n - n % 4
    for pos in range(0, aligned, 4):
        k1 = int.from_bytes(data[pos : pos + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for pos in range(aligned, n):
        b = data[pos]
        half = b - 256 if b >= 128 else b  # Java byte → int sign extension
        h1 = _mix_h1(h1, _mix_k1(half & _M32))
    h1 = _fmix(h1, n)
    return h1 - (1 << 32) if h1 >= 1 << 31 else h1


def spark_hash_string(s: str, seed: int = 42) -> int:
    """F.hash(string_col) equivalent: Spark murmur3 over UTF-8, seed 42."""
    return spark_murmur3_32(s.encode("utf-8"), seed)

"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` for strings.

Spark's xxhash64(col) hashes the UTF-8 bytes of a string with XXH64,
seed 42, and for multi-argument calls chains: the hash of argument i
becomes the seed for argument i+1 (see Spark's XxHash64 expression /
XXH64 in sql/catalyst). Implementing it driver-side removes a Spark
job from the query hot path (tokenize+hash of query terms) — pinned
against F.xxhash64 by tests/test_hashing.py on random unicode strings.

XXH64 itself is Yann Collet's public xxHash algorithm (BSD),
implemented here from the public specification.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of raw bytes (unsigned result)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * P1) + P4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64
        h = ((_rotl(h, 23) * P2) + P3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """= F.xxhash64(lit(s)) — signed 64-bit like Spark's LongType."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_str_int(s: str, extra: int, seed: int = SPARK_SEED) -> int:
    """= F.xxhash64(lit(s), lit(extra)) with an IntegerType literal —
    Spark chains: the string's hash seeds the hash of the int's 4
    little-endian bytes (LongType literals would use 8; pinned by
    tests/test_hashing.py)."""
    h1 = xxh64(s.encode("utf-8"), seed)
    h2 = xxh64(int(extra).to_bytes(4, "little", signed=True), h1)
    return _signed(h2)

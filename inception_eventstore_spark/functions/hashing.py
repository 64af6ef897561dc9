"""Pure-python XXH64 matching Spark's ``xxhash64`` for BinaryType input.

Spark's XxHash64 expression hashes a binary column's raw bytes with the
standard XXH64 algorithm, seed 42 (Catalyst XxHash64 default). Computing
it driver-side lets point-lookups resolve their bucket directory without
launching a 1-row Spark job per call. Equality with the JVM expression
is pinned by tests/test_functions.py::TestXxHash64.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _PRIME2) & MASK64
    return (_rotl(acc, 31) * _PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _PRIME1 + _PRIME4) & MASK64


def xxhash64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (Spark's LongType)."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & MASK64
        v2 = (seed + _PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _PRIME1) & MASK64
        while idx <= n - 32:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _PRIME5) & MASK64
    h = (h + n) & MASK64
    while idx <= n - 8:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _PRIME1 + _PRIME4) & MASK64
        idx += 8
    if idx <= n - 4:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * _PRIME1) & MASK64
        h = (_rotl(h, 23) * _PRIME2 + _PRIME3) & MASK64
        idx += 4
    while idx < n:
        h ^= (data[idx] * _PRIME5) & MASK64
        h = (_rotl(h, 11) * _PRIME1) & MASK64
        idx += 1
    h ^= h >> 33
    h = (h * _PRIME2) & MASK64
    h ^= h >> 29
    h = (h * _PRIME3) & MASK64
    h ^= h >> 32
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(aid: bytes, n_buckets: int) -> int:
    """The bucket directory of an aggregate id — pmod(xxhash64(id), n)."""
    return xxhash64(aid) % n_buckets

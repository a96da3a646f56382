"""Worker-side twin of Spark's ``xxhash64`` expression.

The engine's partition key is ``pmod(xxhash64(clip_id), P)`` (data-derived,
parallelism-independent — checks/base.py::ensure_part_id). The Python-native
payload scan (sources/payload_scan.py) computes the same key INSIDE Arrow
workers without a round-trip through the JVM, so it needs a bit-exact
implementation of Catalyst's XxHash64 on UTF-8 string bytes, seed 42
(`org.apache.spark.sql.catalyst.expressions.XxHash64`, standard XXH64).

Parity is enforced by tests/test_payload_scan.py::test_xxhash64_parity
against ``F.xxhash64`` output.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 over ``data`` — signed-64 result like Spark's."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def part_id(clip_id: str, num_parts: int, seed: int = 42) -> int:
    """pmod(xxhash64(clip_id), num_parts) — twin of ensure_part_id."""
    return xxhash64(clip_id.encode("utf-8"), seed) % num_parts

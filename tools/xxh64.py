"""Pure-Python xxHash64 (XXH64), for oracle-checking Spark's `xxhash64`.

Independent reimplementation of the public XXH64 specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md). Spark's
`F.xxhash64(col)` hashes the UTF-8 bytes of a string with seed 42; this
module lets driver-side Python recompute the same value so xxhash64-derived
operators (SimHash, dedup fingerprints) get an engine-independent oracle —
DuckDB has no xxhash64, so the SQL gate can't cover them.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * P2) & MASK64, 31) * P1) & MASK64


def _merge_round(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * P1 + P4) & MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of `data` as an *unsigned* 64-bit int. Spark's default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * P1) + P4) & MASK64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * P1) & MASK64, 23) * P2) + P3) & MASK64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * P5) & MASK64, 11) * P1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 as a signed 64-bit int — the type Spark's `xxhash64` returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash64_py(text: str, k: int = 2) -> int:
    """Driver-side recomputation of operators.dedup.simhash64 semantics:
    word k-shingles (lowercased, whitespace split, distinct, order-preserving),
    per-bit +-1 votes from each shingle's xxhash64, bit set when vote > 0.
    Returns a signed 64-bit int like the Spark column."""
    toks = [t for t in __import__("re").split(r"\s+", text.strip().lower())]
    if len(toks) >= k:
        seen: dict[str, None] = {}
        for i in range(len(toks) - k + 1):
            seen.setdefault(" ".join(toks[i : i + k]), None)
        sh = list(seen)
    else:
        sh = [" ".join(toks)]
    hashes = [xxh64(s.encode("utf-8")) for s in sh]
    out = 0
    for b in range(64):
        vote = sum(1 if (h >> b) & 1 else -1 for h in hashes)
        if vote > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out

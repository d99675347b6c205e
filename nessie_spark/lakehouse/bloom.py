"""Per-file key bloom filters for point-lookup data skipping.

Min/max key ranges prune range scans, but after a Z-order rewrite the rows
in each file are ordered by (phash, w*h) — every file's image_id range is
wide, and a point lookup (``WHERE image_id = k``) can no longer prune by
range at all. A tiny per-file bloom over image_id (BLOOM_BITS bits in the
manifest entry) restores that: at 10^12 images / 10^6+ files, a lookup
touches the handful of files whose bloom fires instead of the whole table.

Deterministic double hashing (Kirsch–Mitzenmacher over the two 64-bit
halves of md5) — the same scheme the dedup operators use — so filters are
reproducible across writers and resumable jobs. Sizing: m=2048 bits
(256 bytes/entry), k=5 → false-positive ≈ 0.05% at 100 keys/file, ≈ 0.9%
at 64 MB files of ~300 k small rows; a false positive costs one extra file
read, never a wrong row (readers re-apply the predicate).
"""

from __future__ import annotations

import hashlib

import numpy as np

BLOOM_BITS = 2048
BLOOM_K = 5


def _bit_positions(key: str) -> list[int]:
    d = hashlib.md5(str(key).encode()).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd → full-cycle probing
    return [(h1 + i * h2) % BLOOM_BITS for i in range(BLOOM_K)]


def bloom_from_keys(keys) -> bytes:
    """Build one filter over an iterable of string keys."""
    bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for k in keys:
        for p in _bit_positions(k):
            bits[p >> 3] |= 1 << (p & 7)
    return bits.tobytes()


def bloom_or(a: bytes | None, b: bytes | None) -> bytes | None:
    """Union of two filters (streaming fold across record batches)."""
    if a is None:
        return b
    if b is None:
        return a
    return (
        np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
    ).tobytes()


def bloom_might_contain(bloom: bytes | None, key: str) -> bool:
    """False ⇒ the key is definitely absent. ``None`` (an entry written
    before blooms existed) ⇒ unknown, treated as a possible hit."""
    if bloom is None:
        return True
    bits = np.frombuffer(bloom, dtype=np.uint8)
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _bit_positions(key))

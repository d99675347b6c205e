"""Per-file key bloom filters for point-lookup data skipping.

Min/max key ranges prune range scans, but after a Z-order rewrite the rows
in each file are ordered by (phash, w*h) — every file's image_id range is
wide, and a point lookup (``WHERE image_id = k``) can no longer prune by
range at all. A tiny per-file bloom over image_id (BLOOM_BITS bits in the
manifest entry) restores that: at 10^12 images / 10^6+ files, a lookup
touches the handful of files whose bloom fires instead of the whole table.

Deterministic double hashing (Kirsch–Mitzenmacher over the two 64-bit
halves of md5) — the same scheme the dedup operators use — so filters are
reproducible across writers and resumable jobs. (md5 per key is a Python
loop at write time: ~1 µs/key, amortized against the file's pixel IO; a
CRC pair would be faster but CRC-with-different-init is affine in the
input, so h2−h1 collapses to a constant over the equal-length image_ids
and the probe sequence degenerates.)

Sizing is ADAPTIVE: ~10 bits/key rounded up to a power of two, floored at
2048 bits and capped at 2^18 (32 KB/manifest-entry) — a fixed 2048-bit
filter saturates to a 100% hit rate around ~1 k keys, silently turning
point-lookup pruning off for large files. Readers derive m from the
stored filter's length, so mixed sizes coexist in one manifest. k=5 →
false-positive ≈ 1% at 10 bits/key; a false positive costs one extra
file read, never a wrong row (readers re-apply the predicate).

Beyond capacity the filter is OMITTED, not saturated: past BLOOM_MAX_KEYS
(capped size / 5 bits-per-key ≈ 52 k keys, FP ≈ 10% — the last point the
filter still prunes) more keys would only push the capped filter toward a
~100% hit rate, i.e. 32 KB of manifest weight that prunes nothing while
claiming the r3-ADVICE fix. ``None`` reads as unknown (file scanned), the
same outcome as a saturated filter, honestly and for free. This only
bites key-dense files (10^5+ tiny rows per file — the bench's synthetic
small images at a 64 MB target); at the north-star payload (~10^5-byte
images, 8 MB files → 10^2-ish keys/file) every file stays well inside
capacity. A parquet-native per-row-group bloom inside the data file is
the scale answer for key-dense layouts; the manifest is the wrong home
for megabyte filters.
"""

from __future__ import annotations

import hashlib

import numpy as np

BLOOM_MIN_BITS = 2048
BLOOM_MAX_BITS = 1 << 18
BLOOM_BITS_PER_KEY = 10
BLOOM_MIN_BITS_PER_KEY = 5  # below this the capped filter stops pruning
BLOOM_MAX_KEYS = BLOOM_MAX_BITS // BLOOM_MIN_BITS_PER_KEY
BLOOM_K = 5


def bloom_bits_for(n_keys: int) -> int | None:
    """Power-of-two filter size for ``n_keys`` (floored / capped), or
    ``None`` when the key count exceeds what the capped size can usefully
    filter (see module docstring: omit, don't saturate)."""
    if n_keys > BLOOM_MAX_KEYS:
        return None
    want = max(BLOOM_MIN_BITS, BLOOM_BITS_PER_KEY * max(1, n_keys))
    return min(BLOOM_MAX_BITS, 1 << (want - 1).bit_length())


def _bit_positions(key: str, m: int) -> list[int]:
    d = hashlib.md5(str(key).encode()).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd → full-cycle probing
    return [(h1 + i * h2) % m for i in range(BLOOM_K)]


def bloom_from_keys(keys, m: int | None = None) -> bytes | None:
    """Build one filter over an iterable of string keys, or ``None`` for
    over-capacity key counts (omit, don't saturate). ``m`` (bits) defaults
    to the adaptive size for the key count; streaming folds that cannot
    know the final count pass an explicit ``m`` (bloom_or requires equal
    sizes) and apply the capacity rule at planning time instead."""
    ks = list(keys)
    if m is None:
        m = bloom_bits_for(len(ks))
        if m is None:
            return None
    bits = np.zeros(m // 8, dtype=np.uint8)
    for k in ks:
        for p in _bit_positions(k, m):
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
    before blooms existed) ⇒ unknown, treated as a possible hit. The
    filter size is derived from the stored bytes, so entries written
    under different adaptive sizes coexist."""
    if bloom is None:
        return True
    bits = np.frombuffer(bloom, dtype=np.uint8)
    m = len(bloom) * 8
    return all(bits[p >> 3] & (1 << (p & 7)) for p in _bit_positions(key, m))

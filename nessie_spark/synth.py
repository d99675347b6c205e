"""Deterministic synthetic image+caption table generator (FIXTURES.md §1).

Every value is a pure function of ``(seed, image_id)`` so regeneration is
byte-stable and Spark task re-execution is safe — mirrors the reference's
seeded fixture pattern (/root/reference/tests/conftest.py:149-190, seed 42 at
/root/reference/nessie/util.py:20) and its noise injector
(/root/reference/nessie/noise.py:27-56) for corruption fixtures.

Generation is fully distributed: ``spark.range(N)`` → ``mapInPandas`` — the
driver never sees pixel bytes. At 10^12-image scale the same code runs with
more range partitions; there is no driver bottleneck and no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nessie_spark.lakehouse import kernels as K

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)

_COLORS = "red blue green black white golden silver tiny huge bright dark pale shiny old new wild".split()
_NOUNS = "cat dog fox bird fish horse bear wolf lion tiger deer owl hare crab seal moth".split()
_VERBS = "running sleeping jumping hiding flying swimming sitting hunting gliding drifting walking diving resting calling waiting watching".split()
_PLACES = [
    "in the snow", "by the river", "on a hill", "under a tree",
    "near the shore", "in the fog", "at the gate", "on the road",
    "in a field", "by the wall", "on the ice", "in the rain",
    "at the dock", "in the dust", "by the cliff", "on the moor",
]

_HOT_PHASHES = [0x0F0F0F0F0F0F0F0F, 0x00FF00FF00FF00FF, 0x0000FFFF0000FFFF]


def _h(seed: int, i: int, tag: str) -> int:
    """Stable 64-bit hash of (seed, i, tag) — generator-side twin of h64."""
    d = hashlib.md5(f"{seed}|{i}|{tag}".encode()).digest()
    return int.from_bytes(d[:8], "big")


def make_pixels(seed: int, i: int, h: int, w: int) -> np.ndarray:
    """Low-frequency gradient + seeded noise so lossy re-encode holds PSNR>=40."""
    rng = np.random.default_rng(_h(seed, i, "px") % (2**63))
    yy, xx = np.mgrid[0:h, 0:w]
    # per-image low-frequency structure: seeded gradient direction + phase,
    # so phash genuinely varies per image and survives lossy re-encode
    ay, ax, phase = rng.integers(1, 5), rng.integers(1, 5), rng.integers(0, 256)
    base = ((yy * ay * 255) // max(h, 1) + (xx * ax * 255) // max(w, 1) + phase) // 2 % 256
    px = np.stack([base, 255 - base, (base * 2) % 256], axis=2).astype(np.int32)
    px = (px + rng.integers(-8, 9, px.shape)).clip(0, 255).astype(np.uint8)
    return px


def row_for(
    seed: int, i: int, hot_pct: int = 5, wh: tuple[int, int] = (16, 64)
) -> dict:
    """Materialize one image row — pure function of (seed, i, wh)."""
    lo, hi = wh
    w = lo + (_h(seed, i, "w") % (hi - lo + 1))
    h = lo + (_h(seed, i, "h") % (hi - lo + 1))
    fmt = "png" if (_h(seed, i, "f") % 10) < 8 else "jpeg"
    px = make_pixels(seed, i, h, w)
    data = K.encode(px, fmt)
    # phash of the *stored* pixels (post-codec) so verification is exact
    stored = K.decode(data, fmt)
    ph = K.phash64(stored)
    if hot_pct > 0 and (i % 100) < hot_pct:
        ph = _HOT_PHASHES[i % len(_HOT_PHASHES)]
        ph = ph - (1 << 64) if ph >= (1 << 63) else ph
    c = _h(seed, i, "c")
    caption = (
        f"a {_COLORS[c % 16]} {_NOUNS[(c >> 8) % 16]} "
        f"{_VERBS[(c >> 16) % 16]} {_PLACES[(c >> 24) % 16]} #{i}"
    )
    return {
        "image_id": f"img_{i:012d}",
        "bytes": bytearray(data),
        "w": int(w),
        "h": int(h),
        "fmt": fmt,
        "caption": caption,
        "phash": int(ph),
    }


def images_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    hot_pct: int = 5,
    partitions: int | None = None,
    wh: tuple[int, int] = (16, 64),
) -> DataFrame:
    """Distributed deterministic images DataFrame (no driver materialization)."""
    parts = partitions or max(8, n // 2048)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [row_for(seed, int(i), hot_pct, wh) for i in b["id"]]
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, parts).mapInPandas(gen, IMAGES_SCHEMA)


def lognormal_file_boundaries(
    n_rows: int, seed: int = 42, mean_rows: int = 24, sigma: float = 0.8
) -> list[int]:
    """Cumulative row boundaries for the deliberately-small-file layout
    (FIXTURES.md §1.1: log-normal sizes, ~70% below the compaction target)."""
    rng = np.random.default_rng(seed)
    bounds: list[int] = []
    total = 0
    while total < n_rows:
        sz = max(2, int(rng.lognormal(np.log(mean_rows), sigma)))
        total += sz
        bounds.append(min(total, n_rows))
    return bounds


def corrupt_bytes(data: bytes, seed: int, i: int) -> bytes:
    """Flip one byte of the payload body (negative-path fixture, FIXTURES.md §7;
    graft of flipped_label_noise /root/reference/nessie/noise.py:27-56)."""
    buf = bytearray(data)
    # flip within the compressed body, past the codec header
    lo = 16
    pos = lo + (_h(seed, i, "corrupt") % max(1, len(buf) - lo))
    buf[pos] ^= 0xFF
    return bytes(buf)

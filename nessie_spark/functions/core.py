"""Core column expressions.

Everything here is a *pure Catalyst expression* (whole-stage-codegen'd,
JVM-side) except ``hilbert_key_udf`` which is a vectorized pandas UDF
(numpy bit loops over Arrow batches — never per-row Python).

Oracle parity: ``h64`` is deliberately defined via md5 so DuckDB can compute
the identical value (``('0x' || substring(md5(x),1,15))::BIGINT``), letting
hash-based operators (minhash / simhash / fingerprints) be exactly verified
by the ANSI-SQL oracle. All expressions are ANSI-mode-safe (no int overflow,
no out-of-range element_at): the correctness driver runs with Spark 4
defaults (ANSI on).

Reference parity notes cite /root/reference files in each docstring.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# ---------------------------------------------------------------------------
# hashing


def h64(col: Column | str) -> Column:
    """Deterministic 60-bit hash of a string column (md5-prefix based).

    The engine's analog of the reference's seeded hashing discipline
    (nessie/util.py:98-112): every pseudo-random decision is a pure function
    of the value. 15 hex chars = 60 bits, always non-negative, ANSI-safe.

    DuckDB twin: ``('0x' || substring(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast(LongType())


def h64_seeded(col: Column | str, seed: str) -> Column:
    """h64 with a seed tag, for independent hash families (minhash rows)."""
    c = F.col(col) if isinstance(col, str) else col
    return h64(F.concat(F.lit(seed + "|"), c))


# ---------------------------------------------------------------------------
# probability-vector math (reference: classification_entropy.py:20-31,
# prediction_margin.py:16-39, classification_uncertainty.py:25-42)


def softmax_arr(arr: Column) -> Column:
    """Softmax over an array<double> column with max-shift stability.

    Mirrors the logsumexp discipline of knn_entropy.py:117-149.
    """
    mx = F.array_max(arr)
    exps = F.transform(arr, lambda v: F.exp(v - mx))
    denom = F.aggregate(exps, F.lit(0.0), lambda a, v: a + v)
    return F.transform(exps, lambda v: v / denom)


def entropy_ln(probs: Column) -> Column:
    """Shannon entropy (natural log) of an array<double> of probabilities.

    ``0 * ln 0`` handled as 0 (classification_entropy.py:30 semantics).
    """
    return F.aggregate(
        probs,
        F.lit(0.0),
        lambda acc, p: acc - F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0)),
    )


def entropy_log2(probs: Column) -> Column:
    """Entropy base 2 (label_entropy.py:49 uses log2)."""
    return entropy_ln(probs) / F.log(F.lit(2.0))


def prob_margin(probs: Column) -> Column:
    """1 − (p_max − p_2nd): prediction-margin score.

    Reference: prediction_margin.py:16-39 (uses partition/top-2; in-row
    ``array_sort`` is equivalent and stays in codegen).
    """
    s = F.array_sort(probs)
    n = F.size(s)
    # ANSI-safe: guard short arrays (n>=2 always in our callers).
    top = F.get(s, n - 1)
    second = F.get(s, n - 2)
    return F.lit(1.0) - (top - second)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double.

    JVM-side higher-order functions — no Python crossing (J4 scale path,
    knn_entropy.py:64-74 uses faiss; brute-force twin here).
    """
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


# ---------------------------------------------------------------------------
# text


def word_tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the reference tokenizes by token rows;
    featurizer.py:87-88 cleans then splits)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def char_ngrams(col: Column | str, n: int) -> Column:
    """All character n-grams of a string as array<string> (J6 template:
    variational_principle.py:71-123 maximal repeats ≙ bounded n-gram
    inventory)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) >= n,
        F.transform(F.sequence(F.lit(1), F.length(c) - (n - 1)), lambda i: c.substr(i, F.lit(n))),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# space-filling curves (engine: Z-order clustering — SURVEY.md §4.2)

_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_bits(c: Column) -> Column:
    """Spread the low 31 bits of a long so bit i lands at position 2i.

    Pure bitwise Catalyst expressions (5 shift+mask rounds, classic
    magic-number Morton spread) — whole-stage-codegen, no UDF.
    """
    x = c.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton32(a: Column, b: Column) -> Column:
    """62-bit Morton (Z-order) interleave of two 31-bit dimensions.

    Inputs are folded to 31 bits (non-negative) so the result is always a
    positive int64 and range-partitions / min-max stats order correctly.
    north_star: 64-bit Morton key of (phash, w*h) — BASELINE.json:6.
    """
    af = a.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    bf = b.cast("long").bitwiseAND(F.lit(0x7FFFFFFF))
    return _spread_bits(af).bitwiseOR(F.shiftleft(_spread_bits(bf), 1))


def morton32_np(a, b):
    """Vectorized NumPy twin of :func:`morton32` (bit-identical; asserted
    in tests/test_kernels.py). Used by the staged Z-order executor, where
    keys are computed inside pyarrow tasks instead of Catalyst expressions."""
    a = (np.asarray(a, dtype=np.int64)) & 0x7FFFFFFF
    b = (np.asarray(b, dtype=np.int64)) & 0x7FFFFFFF

    def spread(x):
        for shift, mask in _MASKS:
            x = (x | (x << shift)) & mask
        return x

    return spread(a) | (spread(b) << 1)


def order31_np(c):
    """Vectorized NumPy twin of :func:`order31` (sign-flip then top 31
    bits, unsigned shift)."""
    x = np.asarray(c, dtype=np.int64) ^ np.int64(-0x8000000000000000)
    return (x.astype(np.uint64) >> np.uint64(33)).astype(np.int64)


def fold32(c: Column) -> Column:
    """Fold an int64 (e.g. phash) to 31 bits: xor of hi/lo halves, masked.

    Keeps locality of the low bits while mixing in the high half. NOT
    order-preserving — use :func:`order31` for clustering dimensions whose
    raw min/max stats must stay narrow per file.
    """
    x = c.cast("long")
    return x.bitwiseXOR(F.shiftright(x, 31)).bitwiseAND(F.lit(0x7FFFFFFF))


def order31(c: Column) -> Column:
    """Monotonic projection of a signed int64 onto 31 bits.

    Flip the sign bit (signed order → unsigned order), then take the top 31
    bits. Values that compare `<` as signed int64 map to `<=` 31-bit keys, so
    Z-order clustering on this dimension yields *contiguous raw min/max
    ranges per file* — the property manifest-stats data skipping relies on
    (SURVEY.md §4.2 row: per-file min/max stats + data skipping).
    """
    x = c.cast("long").bitwiseXOR(F.lit(-0x8000000000000000))
    return F.shiftrightunsigned(x, 33)


def hilbert_np(a, b):
    """Vectorized 2-D Hilbert index (order 31) over NumPy arrays.

    numpy bit-level loop (31 iterations of vectorized ops — never per-row
    Python). Shared core of the pandas UDF below and the staged Z-order
    executor's in-task key computation.
    """
    ORDER = 31
    x = np.asarray(a, dtype=np.int64) & 0x7FFFFFFF
    y = np.asarray(b, dtype=np.int64) & 0x7FFFFFFF
    d = np.zeros_like(x)
    s = np.int64(1) << (ORDER - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (vectorized branchless form of the classic
        # Hilbert d2xy rotation)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x, y = x_new, y_new
        s >>= 1
    return d


def hilbert_key_udf():
    """Vectorized pandas UDF over :func:`hilbert_np` — the optional Hilbert
    variant behind the same clustering interface as Morton (north_star,
    BASELINE.json:6)."""
    from pyspark.sql.functions import pandas_udf

    def _hilbert_xy(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_np(
                a.to_numpy(dtype=np.int64, na_value=0),
                b.to_numpy(dtype=np.int64, na_value=0),
            )
        )

    return pandas_udf(_hilbert_xy, LongType())

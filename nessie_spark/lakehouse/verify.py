"""Verification suite: the reference's detectors grafted onto table
maintenance (SURVEY.md §2.9). Every function returns per-row flag/score
DataFrames keyed by image_id — never positional (flags are join products,
the Spark re-expression of the reference's positionally-aligned arrays,
/root/reference/nessie/detectors/error_detector.py:79-105).

Correctness gate (BASELINE.json:6,15): identical row sets per snapshot,
caption byte-equality, decoded-pixel allclose (PSNR>=40 dB for lossy fmt).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nessie_spark.lakehouse import kernels as K
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table
from nessie_spark.plans.skew import salted_count


def snapshot_rowset_diff(
    spark: SparkSession, table: Table, snap_a: int, snap_b: int
) -> DataFrame:
    """Rows present in exactly one of two snapshots (must be empty after a
    pure maintenance op). Full-outer join on image_id with null checks
    (SURVEY.md §2.6)."""
    a = scan(spark, table, snapshot_id=snap_a, columns=["image_id"]).alias("a")
    b = scan(spark, table, snapshot_id=snap_b, columns=["image_id"]).alias("b")
    j = a.join(b, on=F.col("a.image_id") == F.col("b.image_id"), how="full_outer")
    return j.where(F.col("a.image_id").isNull() | F.col("b.image_id").isNull()).select(
        F.coalesce(F.col("a.image_id"), F.col("b.image_id")).alias("image_id"),
        F.col("a.image_id").isNull().alias("only_in_b"),
    )


def caption_flags(
    spark: SparkSession, table: Table, snap_a: int, snap_b: int
) -> DataFrame:
    """Retag-shape flagger (/root/reference/nessie/detectors/retag.py:18-34):
    flag = captions differ between two snapshots of the same image_id."""
    a = scan(spark, table, snapshot_id=snap_a, columns=["image_id", "caption"])
    b = scan(spark, table, snapshot_id=snap_b, columns=["image_id", "caption"])
    return (
        a.alias("a")
        .join(b.alias("b"), "image_id")
        .select(
            "image_id",
            # null-SAFE inequality: a caption changing to/from NULL is a
            # corruption and must flag True, not NULL (which .where drops)
            (~F.col("a.caption").eqNullSafe(F.col("b.caption"))).alias("flag"),
        )
    )


def pixel_verify(
    spark: SparkSession,
    table: Table,
    snap_a: int,
    snap_b: int,
    psnr_floor: float = 40.0,
) -> DataFrame:
    """Per-image pixel invariant between snapshots: exact digest match for
    lossless fmt, PSNR >= floor for lossy (input_hint, BASELINE.json:15).

    The decode+PSNR loop runs inside a mapInPandas batch over joined binary
    columns — vectorized Arrow transfer, no per-row Python UDFs. Scorer
    output: psnr (the grafted continuous score); flagger output: ok.
    """
    a = scan(spark, table, snapshot_id=snap_a, columns=["image_id", "bytes", "fmt"])
    b = scan(spark, table, snapshot_id=snap_b, columns=["image_id", "bytes", "fmt"])
    j = (
        a.select("image_id", F.col("bytes").alias("bytes_a"), F.col("fmt").alias("fmt_a"))
        .join(
            b.select("image_id", F.col("bytes").alias("bytes_b"), F.col("fmt").alias("fmt_b")),
            "image_id",
        )
    )

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, ba, fa, bb, fb in zip(
                pdf["image_id"], pdf["bytes_a"], pdf["fmt_a"], pdf["bytes_b"], pdf["fmt_b"]
            ):
                try:
                    pa_ = K.decode(bytes(ba), fa)
                    pb_ = K.decode(bytes(bb), fb)
                    if pa_.shape != pb_.shape:
                        out.append((iid, 0.0, False, "shape"))
                        continue
                    p = K.psnr(pa_, pb_)
                    lossless = fa == "png" and fb == "png"
                    # lossless = byte-exact pixels, NOT a PSNR floor: a
                    # large image with one flipped sample scores >99 dB
                    # yet is corrupt
                    ok = (
                        bool((pa_ == pb_).all())
                        if lossless
                        else bool(p >= psnr_floor)
                    )
                    out.append((iid, float(p), ok, ""))
                except Exception as e:  # undecodable → flagged
                    out.append((iid, 0.0, False, type(e).__name__))
            yield pd.DataFrame(out, columns=["image_id", "psnr", "ok", "error"])

    return j.mapInPandas(_check, "image_id string, psnr double, ok boolean, error string")


def audit_snapshot(
    spark: SparkSession,
    table: Table,
    snapshot_id: int,
    check_pixels: bool = False,
) -> dict:
    """Canned audit for write-audit-publish: run the standard checks against
    a pinned (usually STAGED) snapshot and return a verdict dict —
    ``{"passed": bool, duplicate_ids, null_captions, bad_dimensions,
    corrupt_rows, rows, new_rows}``. The caller publishes on ``passed`` and
    drops otherwise; any bespoke DataFrame check composes the same way
    (``scan(spark, table, snapshot_id=staged)``).

    ``check_pixels`` adds the decode/phash corruption flagger — the
    expensive full-bytes pass; the default audits metadata-shaped
    invariants only (one column-pruned scan, no pixel bytes read)."""
    df = scan(spark, table, snapshot_id=snapshot_id)
    agg = (
        df.select("image_id", "caption", "w", "h")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("image_id").alias("distinct_ids"),
            F.sum(F.col("caption").isNull().cast("long")).alias("null_captions"),
            F.sum(
                ((F.col("w") <= 0) | (F.col("h") <= 0)).cast("long")
            ).alias("bad_dimensions"),
        )
        .first()
    )
    rows = agg["rows"] or 0
    dup = rows - (agg["distinct_ids"] or 0)
    corrupt = 0
    if check_pixels:
        corrupt = corruption_flags(df).where("flag").count()
    cur = table.current_snapshot_id
    cur_rows = scan(spark, table, snapshot_id=cur).count() if cur else 0
    report = {
        "rows": rows,
        "new_rows": rows - cur_rows,
        "duplicate_ids": dup,
        "null_captions": int(agg["null_captions"] or 0),
        "bad_dimensions": int(agg["bad_dimensions"] or 0),
        "corrupt_rows": int(corrupt),
    }
    report["passed"] = (
        dup == 0
        and report["null_captions"] == 0
        and report["bad_dimensions"] == 0
        and corrupt == 0
    )
    return report


def corruption_flags(df: DataFrame) -> DataFrame:
    """Flag rows whose stored bytes fail to decode or whose phash no longer
    matches the decoded pixels — the graft of the noise-injection detector
    (FIXTURES.md §7; /root/reference/nessie/noise.py:27-56 + retag flagger).
    """

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for iid, data, fmt, ph in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["phash"]
            ):
                try:
                    px = K.decode(bytes(data), fmt)
                    out.append((iid, False, int(K.phash64(px)) != int(ph)))
                except Exception:
                    out.append((iid, True, True))
            yield pd.DataFrame(out, columns=["image_id", "undecodable", "flag"])

    return df.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        _check, "image_id string, undecodable boolean, flag boolean"
    )


def duplicate_phash_flags(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Majority-per-surface-form graft (/root/reference/nessie/detectors/
    baselines.py:49-96): phash ≙ surface form, (w, h, fmt) ≙ label. Within
    each phash group of size ≥ 2, flag rows whose shape/fmt is not the
    group's modal value.

    Hot phash keys (the planted skew) are handled with a salted two-phase
    count (plans/skew.py) before the (small) per-group mode window.
    """
    by_label = (
        df.groupBy("phash", "w", "h", "fmt").agg(F.count(F.lit(1)).alias("cnt"))
    )
    grp = salted_count(df, "phash", n_salts).withColumnRenamed("count", "group_size")
    win = Window.partitionBy("phash").orderBy(
        F.desc("cnt"), F.asc("w"), F.asc("h"), F.asc("fmt")
    )
    modal = by_label.withColumn("rk", F.row_number().over(win)).where(F.col("rk") == 1)
    return (
        df.join(grp, "phash")
        .join(
            modal.select(
                "phash",
                F.col("w").alias("mw"),
                F.col("h").alias("mh"),
                F.col("fmt").alias("mf"),
            ),
            "phash",
        )
        .select(
            "image_id",
            "phash",
            (
                (F.col("group_size") >= 2)
                & (
                    (F.col("w") != F.col("mw"))
                    | (F.col("h") != F.col("mh"))
                    | (F.col("fmt") != F.col("mf"))
                )
            ).alias("flag"),
        )
    )


def percentage_flagged(flags: DataFrame, col: str = "flag") -> float:
    """sum(flags)/N (/root/reference/nessie/metrics.py:4-5)."""
    row = flags.agg(F.avg(F.col(col).cast("double")).alias("p")).collect()[0]
    return float(row["p"] or 0.0)

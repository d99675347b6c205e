"""In-place training-data curation pipeline over the images table.

Ties the detector family to the table-maintenance engine as one resumable
job: **detect** perceptual near-duplicates on the stored ``phash`` →
**delete** the losers merge-on-read (metadata-only, O(losers)) →
**purge** the pending keys into a stats-pruned copy-on-write rewrite →
**compact** the now-fragmented small files (FFD) → **cluster** in
space-filling-curve order. The result is the table a 100 TB training run
wants to read: deduplicated, file-count-bounded, skippable.

Scale shape per stage (nothing touches pixel bytes until purge, and purge
rewrites only files that can contain a deleted key):

- detect: the only shuffle is a (band, value) equi-join at
  ``n_bands × rows`` band keys — pigeonhole banding (split the 64-bit
  phash into ``hamming_max+1`` disjoint bands; two hashes within Hamming
  distance ``h ≤ hamming_max`` differ in at most ``h`` bands, so they
  AGREE exactly on ≥ 1 band). No crossJoin; exact popcount only on
  band-collision candidates (same shape as dedup_simhash_pairs,
  operators/dedup.py). Hot exact-dup cliques are bounded the same way the
  simhash operator bounds them: candidate pairs explode quadratically only
  within a band-value bucket, and identical phashes are collapsed to one
  representative per value before the self-join (losers of an exact clique
  are derived WITHOUT pairing them — min(image_id) per phash wins).
- losers: star-dedup — a row loses iff SOME near-dup neighbor has a
  smaller image_id. Deterministic, one aggregation; transitive chains
  (a~b, b~c, a≁c) delete both b and c — the standard conservative choice
  for corpus dedup (near-dup chains are near-dups of each other in
  practice).
- delete: ``deletes.delete_keys`` — range-partitioned key files,
  metadata-only commit.
- purge / compact / cluster: the existing engine jobs, each resumable.

Resumability: every stage derives its job_id from the pipeline's
(``{job_id}-del`` …) and short-circuits on its lineage committed marker,
so a crashed pipeline rerun re-enters at the first uncommitted stage; the
detect scan is recomputed only if the delete has not committed yet (the
detect input is the delete stage's parent snapshot — deterministic).

Reference parity: the reference's detect→correct loop
(error_detector.py:68-72 ``correct()``; README flow) applied to the image
axis — flaggers feed a correction that the lakehouse applies as DML.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nessie_spark.lakehouse import compact as _compact
from nessie_spark.lakehouse import deletes as _deletes
from nessie_spark.lakehouse import lineage
from nessie_spark.lakehouse import zorder as _zorder
from nessie_spark.lakehouse.scan import scan
from nessie_spark.lakehouse.table import Table


@dataclass
class PipelineResult:
    job_id: str
    losers: int
    delete_snapshot: int | None
    purge_snapshot: int | None
    compact_snapshot: int | None
    cluster_snapshot: int | None
    purge_rewritten_files: int
    compact_output_files: int
    stages_skipped: list[str] = field(default_factory=list)


def phash_neardup_pairs(
    images: DataFrame, hamming_max: int = 3
) -> DataFrame:
    """Near-duplicate pairs ``(id_a < id_b, hamming ≤ hamming_max)`` over
    a DataFrame with ``image_id`` and ``phash`` columns.

    Exact (no recall loss): pigeonhole banding guarantees every qualifying
    pair collides on at least one of the ``hamming_max+1`` bands. Exact
    phash duplicates are collapsed to one representative per value BEFORE
    the band self-join, so a clique of k identical images costs k rows,
    not k² pairs; the representative's pairs speak for the whole clique.
    """
    n_bands = hamming_max + 1
    width = 64 // n_bands
    imgs = images.select("image_id", "phash")
    # one representative (min id) per exact phash value
    rep = imgs.groupBy("phash").agg(F.min("image_id").alias("image_id"))

    def _bands(df: DataFrame) -> DataFrame:
        cols = []
        for b in range(n_bands):
            shift = width * b
            # last band takes the remainder bits
            w = 64 - shift if b == n_bands - 1 else width
            mask = -1 if w >= 64 else (1 << w) - 1
            cols.append(
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("phash", shift)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
            )
        return df.select(
            "image_id", "phash", F.explode(F.array(*cols)).alias("bv")
        ).select("image_id", "phash", "bv.band", "bv.val")

    bands = _bands(rep)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "val"])
        .where(F.col("a.image_id") < F.col("b.image_id"))
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .where((F.col("hamming") <= hamming_max) & (F.col("hamming") > 0))
        .groupBy("id_a", "id_b")  # a pair may collide in several bands
        .agg(F.min("hamming").alias("hamming"))
    )


def neardup_losers(
    images: DataFrame, hamming_max: int = 3
) -> DataFrame:
    """``image_id`` rows to remove: every member of an exact-phash clique
    except its min id, plus every row with a smaller-id near-dup neighbor
    (star dedup over the banded pairs). Exact-clique losers never enter
    the pair join, so hot keys cost O(clique), not O(clique²)."""
    imgs = images.select("image_id", "phash")
    rep = imgs.groupBy("phash").agg(F.min("image_id").alias("_keep"))
    exact_losers = (
        imgs.join(rep, "phash")
        .where(F.col("image_id") != F.col("_keep"))
        .select("image_id")
    )
    pair_losers = (
        phash_neardup_pairs(imgs, hamming_max).select(
            F.col("id_b").alias("image_id")
        )
    )
    # a pair loser is a clique representative; its exact duplicates are
    # already losers via exact_losers
    return exact_losers.unionByName(pair_losers).distinct()


def dedup_pipeline(
    spark: SparkSession,
    table: Table,
    job_id: str | None = None,
    hamming_max: int = 3,
    target_bytes: int = _compact.DEFAULT_TARGET,
    strategy: str = "morton",
    reencode: bool = False,
) -> PipelineResult:
    """Run detect → delete → purge → compact → cluster in place.

    Idempotent per stage (lineage committed markers); a full rerun with
    the same ``job_id`` is a metadata no-op. A rerun with a NEW job_id on
    an already-clean table detects zero losers, commits no delete/purge,
    and still performs layout maintenance (compact + cluster)."""
    job_id = job_id or f"pipeline-{uuid.uuid4().hex[:8]}"
    skipped: list[str] = []

    del_job = f"{job_id}-del"
    losers_n = 0
    prev = lineage.committed_snapshot(table.root, del_job)
    if prev is not None:
        skipped.append("delete")
        del_snap: int | None = prev
        # report the ORIGINAL loser count on resume (the commit summary
        # carries it), not a misleading 0
        snap_meta = table.snapshot(prev) or {}
        losers_n = int((snap_meta.get("summary") or {}).get("deleted_keys", 0))
    else:
        losers = neardup_losers(
            scan(spark, table, columns=["image_id", "phash"]), hamming_max
        )
        res = _deletes.delete_keys(spark, table, losers, job_id=del_job)
        del_snap, losers_n = res.snapshot_id, res.n_keys
        table = table.refresh()

    purge = _deletes.purge_deletes(spark, table, job_id=f"{job_id}-purge")
    table = table.refresh()
    if purge.snapshot_id is None:
        skipped.append("purge")

    comp = _compact.compact(
        spark, table, target_bytes=target_bytes, job_id=f"{job_id}-compact",
        reencode=reencode, verify_psnr=reencode,
    )
    table = table.refresh()
    if comp.snapshot_id is None:
        skipped.append("compact")

    clus = _zorder.cluster(
        spark, table, strategy=strategy, target_bytes=target_bytes,
        job_id=f"{job_id}-cluster", reencode=reencode,
    )
    return PipelineResult(
        job_id=job_id,
        losers=losers_n,
        delete_snapshot=del_snap,
        purge_snapshot=purge.snapshot_id,
        compact_snapshot=comp.snapshot_id,
        cluster_snapshot=clus.snapshot_id,
        purge_rewritten_files=purge.rewritten_files,
        compact_output_files=comp.output_files,
        stages_skipped=skipped,
    )

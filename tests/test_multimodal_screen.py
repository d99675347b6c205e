"""Semantics + plan tests for the pixel-side curation ops: the quality/
corruption screen and the dual-hash (aHash + dHash) consensus near-dup.

The driver gate records these rows-only (decode is not SQL-expressible);
these tests carry the correctness burden: planted degenerate/duplicate
images must be caught, clean synthetics must not be, and the plans must
stay banded (no cross product) with pixels never leaving the UDF.
"""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_quality_screen_flags_planted_only(spark):
    from nessie_spark.operators.maintenance import multimodal_quality_screen

    rows = multimodal_quality_screen(spark, SF).collect()
    flats = [r for r in rows if r.image_id.startswith("flat_")]
    nat = [r for r in rows if not r.image_id.startswith("flat_")]
    assert len(flats) == 16 and len(nat) == 128
    # every planted flat frame is low-contrast, blurry, AND exposure-flagged
    for r in flats:
        assert r.low_contrast and r.blurry and (r.too_dark or r.too_bright)
        assert r.luma_entropy_bits < 0.1  # constant frame carries ~0 bits
    # dark flats flag dark, bright flats flag bright — never both
    assert sum(r.too_dark for r in flats) == 8
    assert sum(r.too_bright for r in flats) == 8
    assert not any(r.too_dark and r.too_bright for r in flats)
    # no textured synthetic trips any screen
    assert not any(
        r.too_dark or r.too_bright or r.low_contrast or r.blurry for r in nat
    )
    # feature sanity: textured images carry real entropy and sharpness
    assert min(r.luma_entropy_bits for r in nat) > 3.0
    assert min(r.sharpness for r in nat) > 100.0


def test_quality_screen_is_pure_map(spark):
    """Zero shuffles before the presentation sort: the only exchange in the
    plan is the final range partitioning for orderBy."""
    from nessie_spark.operators.maintenance import multimodal_quality_screen

    plan = _plan(multimodal_quality_screen(spark, SF))
    import re

    assert len(re.findall(r"hashpartitioning\(", plan)) == 0, plan[:2000]


def test_dhash_consensus_catches_planted_bright_copies(spark):
    from nessie_spark.operators.maintenance import multimodal_dhash_consensus

    rows = multimodal_dhash_consensus(spark, SF).collect()
    pairs = {(r.id_a, r.id_b): (r.d_ham, r.p_ham) for r in rows}
    # every planted (source, +6-luma copy) pair survives both thresholds
    planted = [
        (a, b) for (a, b) in pairs if a == f"bright_{b}" or b == f"bright_{a}"
    ]
    assert len(planted) >= 10
    for key in planted:
        d_ham, p_ham = pairs[key]
        assert d_ham <= 3 and p_ham <= 8
    # thresholds actually enforced on everything returned
    assert all(d <= 3 and p <= 8 for d, p in pairs.values())
    # deterministic: second run yields the identical pair set
    again = multimodal_dhash_consensus(spark, SF).collect()
    assert {(r.id_a, r.id_b) for r in again} == set(pairs)


def test_dhash_consensus_no_cross_product(spark):
    from nessie_spark.operators.maintenance import multimodal_dhash_consensus

    plan = _plan(multimodal_dhash_consensus(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # pixels never leave the UDF: the join sides carry only ids + hashes
    assert "bytes" not in plan.split("Exchange")[-1]

"""Tile-phash partial-duplicate (crop) detection: planted tile-aligned
crops must be found at the exact spatial offset, with zero false pairs."""

from pyspark.sql import functions as F


def test_planted_crops_detected_at_exact_offset(spark):
    from nessie_spark.operators.maintenance import multimodal_tile_cropdup

    rows = multimodal_tile_cropdup(spark, "/root/testdata/sf0.001").collect()
    # every reported pair is a (crop-X, X) pair — no cross-image noise
    assert rows, "no pairs detected"
    for r in rows:
        assert r.id_a == f"crop-{r.id_b}", (r.id_a, r.id_b)
        # the crop dropped the first block row+column, so crop tile (0,0)
        # aligns with source tile (1,1): offset is exactly (-1,-1)
        assert (r.dr, r.dc) == (-1, -1)
        assert r.shared_tiles >= 4
    # most of the 16 attempted crops are found (a few sources are smaller
    # than 3 tiles and produce no crop at all)
    assert len(rows) >= 10


def test_whole_image_phash_misses_what_tiles_catch(spark):
    """The reason this operator exists: a crop's whole-image phash differs
    from its source's, so phash-equality dedup cannot pair them."""
    import pandas as pd

    from nessie_spark import synth
    from nessie_spark.lakehouse import kernels as K

    pdf = synth.images_df(spark, 16, seed=11).where(
        F.col("fmt") == "png"
    ).orderBy("image_id").limit(4).toPandas()
    misses = 0
    for _, r in pdf.iterrows():
        px = K.decode(bytes(r["bytes"]), r["fmt"])
        h, w, _ = px.shape
        th, tw = (h // 8) * 8, (w // 8) * 8
        if th < 24 or tw < 24:
            continue
        crop = px[8:th, 8:tw]
        if K.phash64(px) != K.phash64(crop):
            misses += 1
    assert misses >= 1  # whole-image hashing provably insufficient

"""MinHash estimator-quality audit: exact Jaccard vs 32-hash estimate."""

from nessie_spark.operators.dedup import minhash_jaccard_error


def test_near_dup_pair_scored_with_small_error(spark, tmp_path):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark woods tonight")
    rows = [
        (0, base),
        (1, base + " extra"),          # J high → banding catches it
        (2, "совершенно другой текст без общих слов вообще никаких тут"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    got = {(r.id_a, r.id_b): r for r in minhash_jaccard_error(spark, str(tmp_path)).collect()}
    assert (0, 1) in got  # identical-prefix docs must collide in ≥1 band
    r = got[(0, 1)]
    # doc0 has 18 shingles, doc1 has 19, 18 shared → J = 18/19
    assert abs(r.jaccard - 18 / 19) < 1e-6
    assert 0.0 <= r.mh_estimate <= 1.0
    assert abs(r.abs_err - abs(r.jaccard - r.mh_estimate)) < 1e-6
    # the estimator should not be wildly off for a J≈0.95 pair
    assert r.mh_estimate >= 0.5
    assert (0, 2) not in got and (1, 2) not in got

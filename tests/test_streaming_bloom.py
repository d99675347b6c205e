"""Streaming incremental bloom dedup (streaming/ops.bloom_screen_and_fold):
screen-then-fold semantics, exactly-once replay, and the end-to-end
readStream wiring."""

import os

from nessie_spark.streaming.ops import (
    bloom_screen_and_fold,
    load_bloom_state,
    start_bloom_dedup,
)

DOCS_DDL = "doc_id long, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def test_screen_then_fold_and_replay(spark, tmp_path):
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    a = "alpha beta gamma delta epsilon zeta"
    b1 = [(1, a), (2, "one two three four five six")]
    bloom_screen_and_fold(_df(spark, b1), state, out, 0)
    r0 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(r0) == 2 and not any(r.flagged for r in r0.values())  # empty bloom
    last, m, blob = load_bloom_state(state)
    assert last == 0 and m > 0 and blob

    # batch 1: a near-copy of doc 1 (shares its 5-token prefix) + a fresh doc
    b2 = [(3, "alpha beta gamma delta epsilon eta"),
          (4, "totally fresh words nobody wrote before now")]
    bloom_screen_and_fold(_df(spark, b2), state, out, 1)
    r1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(r1) == 4
    assert r1[3].flagged and r1[3].n_seen >= 1   # caught against history
    assert not r1[4].flagged

    # replays of both committed batches are complete no-ops
    state_before = load_bloom_state(state)
    bloom_screen_and_fold(_df(spark, b1), state, out, 0)
    bloom_screen_and_fold(_df(spark, b2), state, out, 1)
    assert spark.read.parquet(out).count() == 4
    assert load_bloom_state(state) == state_before
    # partition discovery surfaces batch_id
    assert {r.batch_id for r in spark.read.parquet(out).select("batch_id").collect()} == {0, 1}


def test_stream_wiring_drains_and_persists_state(spark, tmp_path):
    src = str(tmp_path / "src")
    _df(spark, [(i, f"document number {i} with several words") for i in range(6)]) \
        .write.parquet(src)
    state, out, ckpt = (str(tmp_path / d) for d in ("st", "out", "ck"))
    q = start_bloom_dedup(
        spark.readStream.schema(DOCS_DDL).parquet(src), state, out, ckpt
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 6
    assert load_bloom_state(state)[0] >= 0

"""Streaming incremental bloom dedup (streaming/ops.bloom_screen_and_fold):
screen-then-fold semantics, exactly-once replay, and the end-to-end
readStream wiring."""

import json
import os

from nessie_spark.streaming.ops import bloom_screen_and_fold, start_bloom_dedup

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
    assert json.load(open(os.path.join(state, "bloom_meta.json")))["last_batch"] == 0

    # batch 1: a near-copy of doc 1 (shares its 5-token prefix) + a fresh doc
    b2 = [(3, "alpha beta gamma delta epsilon eta"),
          (4, "totally fresh words nobody wrote before now")]
    bloom_screen_and_fold(_df(spark, b2), state, out, 1)
    r1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(r1) == 4
    assert r1[3].flagged and r1[3].n_seen >= 1   # caught against history
    assert not r1[4].flagged

    # replays of both committed batches are complete no-ops
    bloom_before = open(os.path.join(state, "bloom.bin"), "rb").read()
    bloom_screen_and_fold(_df(spark, b1), state, out, 0)
    bloom_screen_and_fold(_df(spark, b2), state, out, 1)
    assert spark.read.parquet(out).count() == 4
    assert open(os.path.join(state, "bloom.bin"), "rb").read() == bloom_before


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
    assert os.path.exists(os.path.join(state, "bloom.bin"))

"""Streaming heavy hitters (streaming/ops.cms_fold_and_rank): fold-then-
rank semantics, exact linearity of the folded sketch (streamed counters ==
single-shot counters), exactly-once replay, and readStream wiring."""

import collections
import hashlib
import os

from nessie_spark.operators.textstats import CMS_D, CMS_W
from nessie_spark.streaming.ops import (
    cms_fold_and_rank,
    load_cms_state,
    start_cms_heavy_hitters,
)

DOCS_DDL = "doc_id long, text string"


def _df(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def _ref_est(texts, tok):
    counters = [[0] * CMS_W for _ in range(CMS_D)]
    for t in texts:
        for w in t.split():
            for r in range(CMS_D):
                h = int(hashlib.md5(f"cms{r}|{w}".encode()).hexdigest()[:15], 16)
                counters[r][h % CMS_W] += 1
    return min(
        counters[r][
            int(hashlib.md5(f"cms{r}|{tok}".encode()).hexdigest()[:15], 16) % CMS_W
        ]
        for r in range(CMS_D)
    )


def test_fold_rank_linearity_and_replay(spark, tmp_path):
    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    b0 = [(1, "spark spark spark flink beam"), (2, "spark flink flink ray")]
    b1 = [(3, "beam beam spark spark"), (4, "ray dask dask beam")]
    cms_fold_and_rank(_df(spark, b0), state, out, 0, k=5)
    cms_fold_and_rank(_df(spark, b1), state, out, 1, k=5)

    texts = [t for _, t in b0 + b1]
    truth = collections.Counter(w for t in texts for w in t.split())
    final = {
        r.tok: r.est_count
        for r in spark.read.parquet(out).where("batch_id = 1").collect()
    }
    # CMS addition is linear: streamed-and-folded est == single-shot est,
    # and est is an overestimate-only bound on the true count
    for tok in truth:
        assert final[tok] == _ref_est(texts, tok)
        assert final[tok] >= truth[tok]
    # the heavy token ranks first
    top = spark.read.parquet(out).where("batch_id = 1").orderBy("rank").first()
    assert top.tok == "spark"

    # replays of committed batches are complete no-ops
    last, counters, cands = load_cms_state(state)
    cms_fold_and_rank(_df(spark, b0), state, out, 0, k=5)
    cms_fold_and_rank(_df(spark, b1), state, out, 1, k=5)
    last2, counters2, cands2 = load_cms_state(state)
    assert last2 == last == 1
    assert (counters2 == counters).all() and cands2 == cands


def test_cms_stream_wiring_drains_and_persists_state(spark, tmp_path):
    src = str(tmp_path / "src")
    _df(
        spark,
        [(i, "common words everywhere " + f"unique{i}") for i in range(6)],
    ).write.parquet(src)
    state, out, ckpt = (str(tmp_path / d) for d in ("st", "out", "ck"))
    q = start_cms_heavy_hitters(
        spark.readStream.schema(DOCS_DDL).parquet(src), state, out, ckpt
    )
    q.awaitTermination(120)
    last, counters, cands = load_cms_state(state)
    assert last >= 0 and counters.sum() == 6 * 4 * CMS_D  # 4 tokens/doc × d rows
    top = (
        spark.read.parquet(out)
        .where(f"batch_id = {last}")
        .orderBy("rank")
        .limit(3)
        .collect()
    )
    assert {r.tok for r in top} == {"common", "words", "everywhere"}
    assert all(r.est_count >= 6 for r in top)

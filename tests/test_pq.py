"""Product-quantization ANN: recall gate vs exact brute force, code
compactness, and the re-rank contract (returned distances are TRUE L2,
not ADC approximations)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _vectors():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(t.column("vec_id").to_pylist())
    order = np.argsort(ids)
    return X[order], ids[order]


def test_pq_recall_and_exact_rerank(spark):
    from nessie_spark.operators.similarity import N_QUERIES, TOP_K, ann_pq_topk

    rows = ann_pq_topk(spark, SF).collect()
    X, ids = _vectors()
    got = {}
    for r in rows:
        got.setdefault(r.qid, []).append(r)
    assert set(got) == set(range(N_QUERIES))
    hits = total = 0
    for q in range(N_QUERIES):
        d = ((X - X[q]) ** 2).sum(axis=1)
        d[ids == q] = np.inf
        true_top = set(ids[np.argsort(d)[:TOP_K]])
        mine = got[q]
        assert len(mine) == TOP_K
        assert all(r.nid != q for r in mine)  # self excluded
        # the reported distance is the TRUE L2 of the pair (re-rank
        # contract), not the ADC estimate
        for r in mine:
            true_l2 = float(((X[ids == r.nid][0] - X[q]) ** 2).sum())
            assert abs(r.l2 - true_l2) < 1e-4
        # ranks are sorted by that distance
        l2s = [r.l2 for r in sorted(mine, key=lambda r: r.rk)]
        assert l2s == sorted(l2s)
        hits += len(true_top & {r.nid for r in mine})
        total += TOP_K
    # 8-byte codes + 100-candidate re-rank: ≥70% of true top-5 recovered
    # (measured 0.81 on this fixture; the gate leaves drift headroom)
    assert hits / total >= 0.70, hits / total


def test_pq_codebook_shapes_and_code_range(spark):
    from nessie_spark.operators.similarity import (
        PQ_K, PQ_M, PQ_SUB, _emb, _pq_codebooks, _pq_codes_udf,
    )
    from pyspark.sql import functions as F

    emb = _emb(spark, SF)
    cents = _pq_codebooks(emb)
    assert len(cents) == PQ_M
    assert all(len(cb) == PQ_K for cb in cents)
    assert all(len(c) == PQ_SUB for cb in cents for c in cb)
    codes = emb.select(_pq_codes_udf(cents)(F.col("e")).alias("c")).collect()
    for r in codes:
        assert len(r.c) == PQ_M
        assert all(0 <= k < PQ_K for k in r.c)

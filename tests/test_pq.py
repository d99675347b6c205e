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


def test_ivfpq_recall_matches_ivf_ceiling(spark):
    """IVF-PQ (probe cells, ADC within probed lists, exact re-rank) must
    recover the IVF-L2 ceiling: the best any nprobe=4 IVF index can do is
    exact L2 within the probed cells — the PQ shortlist + re-rank may not
    lose recall vs that ceiling at this scale (shortlist covers the probed
    lists)."""
    from pyspark.sql import functions as F

    from nessie_spark.operators.similarity import (
        IVF_K, IVFPQ_NPROBE, N_QUERIES, TOP_K, _emb, _ivf_centroids,
        ann_ivfpq_topk,
    )

    sf = "/root/testdata/sf0.001"
    rows = ann_ivfpq_topk(spark, sf).collect()
    got = {}
    for r in rows:
        got.setdefault(r.qid, set()).add(r.nid)
    assert set(got) == set(range(N_QUERIES))

    X, ids = _vectors_at(sf)
    C = np.array(_ivf_centroids(_emb(spark, sf)), dtype=np.float64)  # (K, d)
    d2c = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (n, K)
    cell = d2c.argmin(axis=1)
    hits_pq = hits_ceiling = total = 0
    for q in range(N_QUERIES):
        qi = int(np.where(ids == q)[0][0])
        probe = np.lexsort((np.arange(IVF_K), d2c[qi]))[:IVFPQ_NPROBE]
        d = ((X - X[qi]) ** 2).sum(axis=1)
        d[ids == q] = np.inf
        true_top = set(ids[np.argsort(d)[:TOP_K]])
        in_probed = np.isin(cell, probe) & (ids != q)
        cand = np.where(in_probed)[0]
        order = cand[np.lexsort((ids[cand], d[cand]))][:TOP_K]
        ceiling_top = set(ids[order])
        hits_ceiling += len(true_top & ceiling_top)
        hits_pq += len(true_top & got[q])
        total += TOP_K
    assert hits_pq / total >= hits_ceiling / total, (hits_pq, hits_ceiling)


def _vectors_at(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(t.column("vec_id").to_pylist())
    order = np.argsort(ids)
    return X[order], ids[order]


def test_pq_candidates_never_reach_exchange_unbounded(spark):
    """The r4 weak-#1 fix, plan-asserted: the ADC candidate set is bounded
    per-partition INSIDE MapInPandas, so between the kernel and the qid
    Exchange there is no other Exchange, and the old |Q|x|corpus|
    crossJoin (CartesianProduct / BroadcastNestedLoopJoin) is gone."""
    import contextlib
    import io

    from nessie_spark.operators.similarity import ann_ivfpq_topk, ann_pq_topk

    for fn in (ann_pq_topk, ann_ivfpq_topk):
        df = fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__
        assert "MapInPandas" in plan, fn.__name__
        # parent-above-child in the printed tree: the qid Exchange must sit
        # directly above the kernel with no other Exchange between them
        ex = plan.index("Exchange hashpartitioning(qid")
        mp = plan.index("MapInPandas")
        assert ex < mp, fn.__name__
        assert "Exchange" not in plan[ex + 10 : mp], fn.__name__

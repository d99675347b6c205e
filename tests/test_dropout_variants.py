"""Dropout original/variance formulations vs the reference's NumPy math.

The reference keeps these two as commented-out alternatives in
detectors/dropout_uncertainty.py:55-77; both are ported here as
oracle-backed registry queries. This twin recomputes them with the
reference's exact NumPy expressions from the same T=3 softmax slices and
checks allclose — the argmax tie-break (first max) must agree too.
"""

import numpy as np
import pytest

import nessie_spark.operators.detectors3 as D

SF = "/root/testdata/sf0.001"


def _repeated_probs(spark):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    emb = np.array([r.embedding for r in rows], dtype=np.float64)
    reps = []
    for lo in (0, 4, 8):  # python 0-based twins of slices (1,5,9)
        sl = emb[:, lo : lo + 4]
        ex = np.exp(sl - sl.max(axis=1, keepdims=True))
        reps.append(ex / ex.sum(axis=1, keepdims=True))
    return ids, np.stack(reps, axis=1)  # (n, T=3, C=4)


def test_dropout_original_matches_reference_numpy(spark):
    ids, Y = _repeated_probs(spark)
    n, T, _ = Y.shape
    want = (np.einsum("ntc,ntc->n", Y, Y) / T) - np.einsum(
        "nc,nc->n", Y.mean(axis=1), Y.mean(axis=1)
    )
    got = {r.vec_id: r.score for r in D.dropout_original_scores(spark, SF).collect()}
    assert len(got) == n
    np.testing.assert_allclose(
        np.array([got[i] for i in ids]), np.round(want, 6), atol=1e-6
    )


def test_dropout_variance_matches_reference_numpy(spark):
    ids, Y = _repeated_probs(spark)
    preds = np.argmax(Y, axis=2)  # first-max ties, like the engines
    want = np.var(preds, axis=1)
    got = {r.vec_id: r.score for r in D.dropout_variance_scores(spark, SF).collect()}
    np.testing.assert_allclose(
        np.array([got[i] for i in ids]), np.round(want, 6), atol=1e-6
    )
    # the fixture must actually exercise disagreement between runs
    assert (want > 0).any() and (want == 0).any()

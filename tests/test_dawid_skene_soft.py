"""Soft (probabilistic) Dawid–Skene EM — NumPy-twin allclose gate.

The reference adjudicates with crowd-kit's soft EM, n_iter=100
(/root/reference/nessie/detectors/label_aggregation.py:78); the repo's
oracle-exact query is hard-EM. This module gates the soft variant: the
distributed implementation must match a straight-line NumPy twin of the
same update rules, on a fixture where soft and hard EM genuinely
disagree (so the test proves the NEW semantics, not the shared ones).
"""

import numpy as np
import pytest

from nessie_spark.operators.detectors3 import N_CLASSES, soft_dawid_skene

C = N_CLASSES
FLOOR = 1e-12

# seed-0 random votes (12 tasks × 3 workers): soft and hard EM disagree on
# 7 of 12 adjudications (found by exhaustive twin comparison)
VOTES = [
    [3, 2, 2], [1, 1, 0], [0, 0, 0], [3, 2, 3], [2, 2, 3], [2, 2, 2],
    [2, 3, 1], [3, 2, 0], [1, 3, 2], [0, 3, 2], [3, 0, 0], [3, 0, 2],
]
NOISY = [v[0] for v in VOTES]


def soft_ds_twin(votes: np.ndarray, n_iter: int = 100, tol: float = 1e-12):
    """Straight-line twin of detectors3.soft_dawid_skene (same init,
    update order, probability floor, and fixed-point early stop)."""
    n, W = votes.shape
    p = np.zeros((n, C))
    for c in range(C):
        p[:, c] = (votes == c).sum(axis=1) / W
    prev = None
    for _ in range(n_iter):
        pi = p.sum(axis=0) / n
        E = np.zeros((W, C, C))
        for w in range(W):
            for c in range(C):
                s = np.array([p[votes[:, w] == k, c].sum() for k in range(C)])
                tot = s.sum()
                E[w, c] = np.maximum(s / tot, FLOOR) if tot > 0 else 1.0 / C
        flat = np.concatenate([pi, E.ravel()])
        if prev is not None and np.max(np.abs(flat - prev)) < tol:
            break
        prev = flat
        s = np.tile(pi, (n, 1))
        for w in range(W):
            s = s * E[w][:, votes[:, w]].T
        p = s / s.sum(axis=1, keepdims=True)
    return p, np.argmax(p, axis=1)


def hard_ds_twin(votes: np.ndarray, n_iter: int = 5):
    """Twin of the repo's integer-exact hard EM (detectors3.py
    dawid_skene_labels: majority init, Laplace counts, argmax e-step)."""
    n, W = votes.shape
    cnt = np.zeros((n, C), dtype=int)
    for c in range(C):
        cnt[:, c] = (votes == c).sum(axis=1)
    z = np.argmax(cnt, axis=1)
    for _ in range(n_iter):
        pc = np.bincount(z, minlength=C)
        theta = np.zeros((W, C, C))
        for w in range(W):
            for c in range(C):
                tcnt = np.bincount(votes[z == c, w], minlength=C)
                theta[w, c] = (tcnt + 1) / (pc[c] + C)
        pi = (pc + 1) / (n + C)
        s = np.tile(pi, (n, 1))
        for w in range(W):
            s = s * theta[w][:, votes[:, w]].T
        z = np.argmax(s, axis=1)
    return z


@pytest.fixture(scope="module")
def votes_np():
    return np.asarray(VOTES, dtype=np.int64)


def test_fixture_soft_and_hard_disagree(votes_np):
    """Guard: the fixture exercises the semantics gap — soft posteriors
    adjudicate differently from hard EM's per-round quantization."""
    _, soft = soft_ds_twin(votes_np)
    hard = hard_ds_twin(votes_np)
    assert np.any(soft != hard)


def test_spark_soft_ds_matches_numpy_twin(spark, votes_np):
    votes_df = spark.createDataFrame(
        [
            (i, NOISY[i], int(v[0]), int(v[1]), int(v[2]))
            for i, v in enumerate(VOTES)
        ],
        "vec_id long, noisy int, v1 int, v2 int, v3 int",
    )
    out = soft_dawid_skene(votes_df).collect()
    p_twin, adj_twin = soft_ds_twin(votes_np)

    assert [r.vec_id for r in out] == list(range(len(VOTES)))
    p_spark = np.array([[r.p0, r.p1, r.p2, r.p3] for r in out])
    np.testing.assert_allclose(p_spark, p_twin, atol=1e-8, rtol=1e-6)
    assert [r.adjudicated for r in out] == adj_twin.tolist()
    assert all(r.flag == (r.adjudicated != r.noisy) for r in out)


def test_distributed_path_matches_twin_w8(spark):
    """Scale regime: W=8 annotators force the distributed weighted-EM path
    (max_driver_patterns=1 ⇒ the histogram never collects; every round is
    an Arrow stats pass + driver m-step). Must match the straight-line
    NumPy twin — proving the two regimes implement ONE set of update
    rules, so the operator no longer carries a C^W driver cap."""
    rng = np.random.default_rng(7)
    n, Wn = 60, 8
    votes = rng.integers(0, C, size=(n, Wn)).astype(np.int64)
    cols = [f"w{i}" for i in range(Wn)]
    df = spark.createDataFrame(
        [
            (i, int(votes[i, 0]), *[int(x) for x in votes[i]])
            for i in range(n)
        ],
        "vec_id long, noisy int, " + ", ".join(f"{c} int" for c in cols),
    )
    out = soft_dawid_skene(
        df, workers=tuple(cols), n_iter=30, max_driver_patterns=1
    ).collect()
    p_twin, adj_twin = soft_ds_twin(votes, n_iter=30)

    assert [r.vec_id for r in out] == list(range(n))
    p_spark = np.array([[r[f"p{c}"] for c in range(C)] for r in out])
    np.testing.assert_allclose(p_spark, p_twin, atol=1e-8, rtol=1e-6)
    assert [r.adjudicated for r in out] == adj_twin.tolist()
    assert all(r.flag == (r.adjudicated != r.noisy) for r in out)


def test_driver_and_distributed_paths_agree(spark):
    """The SAME input through both regimes (threshold flipped) produces
    allclose posteriors and identical adjudications."""
    votes_np = np.asarray(VOTES, dtype=np.int64)
    df = spark.createDataFrame(
        [(i, NOISY[i], int(v[0]), int(v[1]), int(v[2])) for i, v in enumerate(VOTES)],
        "vec_id long, noisy int, v1 int, v2 int, v3 int",
    )
    drv = soft_dawid_skene(df, n_iter=40).collect()
    dist = soft_dawid_skene(df, n_iter=40, max_driver_patterns=1).collect()
    p_d = np.array([[r[f"p{c}"] for c in range(C)] for r in drv])
    p_x = np.array([[r[f"p{c}"] for c in range(C)] for r in dist])
    np.testing.assert_allclose(p_x, p_d, atol=1e-8, rtol=1e-6)
    assert [r.adjudicated for r in drv] == [r.adjudicated for r in dist]

"""LOF grouped-map (mean_distance_lof_scores): semantics per Breunig et al.
2000 / sklearn LocalOutlierFactor (reference mean_distance.py:95-103).
No SQL oracle (neighborhood logic) — golden-property tests instead."""

import numpy as np
import pyspark.sql.functions as F


def _df_from(spark, X, labels):
    rows = [
        (int(i), [float(v) for v in x], int(lbl))
        for i, (x, lbl) in enumerate(zip(X, labels))
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _run_lof(spark, tmp_path, X, labels):
    import nessie_spark.operators.probability as P

    d = str(tmp_path / "emb")
    _df_from(spark, X, labels).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return {
        r.vec_id: r.score
        for r in P.mean_distance_lof_scores(spark, d).collect()
    }


def test_lof_flags_planted_outlier(spark, tmp_path):
    rng = np.random.RandomState(7)
    # two classes: tight 64-d gaussian blobs + one far outlier each
    X0 = rng.normal(0, 0.05, size=(40, 64))
    X1 = rng.normal(3, 0.05, size=(40, 64))
    out0 = np.full((1, 64), 10.0)
    out1 = np.full((1, 64), -10.0)
    X = np.vstack([X0, out0, X1, out1])
    labels = [0] * 41 + [1] * 41
    scores = _run_lof(spark, tmp_path, X, labels)
    assert len(scores) == 82
    # outliers (ids 40 and 81) score far above 1; blob members near 1
    assert scores[40] > 2.0 and scores[81] > 2.0
    inliers = [v for k, v in scores.items() if k not in (40, 81)]
    assert max(inliers) < 1.5
    assert min(inliers) > 0.5


def test_lof_matches_independent_definition(spark, tmp_path):
    """Cross-check the grouped-map against an independently coded LOF
    (k-distance neighborhoods with ties, reachability, lrd ratio)."""
    rng = np.random.RandomState(3)
    X = rng.normal(0, 1.0, size=(30, 8))
    labels = [0] * 30
    got = _run_lof(spark, tmp_path, X, labels)

    from nessie_spark.operators.probability import LOF_K

    n = len(X)
    k = min(LOF_K, n - 1)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    kdist = np.sort(D, axis=1)[:, k - 1]
    neigh = [np.where(D[i] <= kdist[i])[0] for i in range(n)]
    lrd = np.array(
        [len(neigh[i]) / np.maximum(kdist[neigh[i]], D[i, neigh[i]]).sum() for i in range(n)]
    )
    expect = np.array([lrd[neigh[i]].mean() / lrd[i] for i in range(n)])
    for i in range(n):
        assert abs(got[i] - round(float(expect[i]), 6)) < 1e-9


def test_mean_distance_metrics_consistent(spark, tmp_path):
    """cosine/dot/euclid agree qualitatively: the planted far point is the
    worst-scored under every metric within its class."""
    import nessie_spark.operators.probability as P

    rng = np.random.RandomState(11)
    X = np.vstack([rng.normal(1, 0.1, size=(20, 16)), np.full((1, 16), -5.0)])
    labels = [0] * 21
    d = str(tmp_path / "emb2")
    _df_from(spark, X, labels).write.mode("overwrite").parquet(
        f"{d}/embeddings.parquet"
    )
    for fn in (
        P.mean_distance_scores,
        P.mean_distance_cosine_scores,
        P.mean_distance_dot_scores,
    ):
        rows = fn(spark, d).collect()
        worst = max(rows, key=lambda r: r.score)
        assert worst.vec_id == 20, fn.__name__

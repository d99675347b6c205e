"""Model zoo (O14) + 2PL IRT (O9) gates.

Zoo contract tests mirror the reference's model smoke tests
(/root/reference/tests — fit on a small labeled set, predict_proba shape
and probability-simplex checks); the 2PL test pins the distributed
gradient fit to an identical NumPy twin (the same simultaneous-update
schedule), which is the strongest cross-implementation check available for
an iterative float algorithm (exact SQL unrolling is impractical at 24
iterations).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _features_df(spark, n=200, d=8, classes=3):
    """Separable synthetic set: class c centered at 3*e_{c}."""
    rows = []
    rng = np.random.default_rng(42)
    for i in range(n):
        c = i % classes
        v = rng.normal(0, 0.5, d)
        v[c] += 3.0
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(rows, "vec_id long, features array<double>, label int")


def test_dummy_classifier_priors(spark):
    from nessie_spark.models.zoo import DummyClassifier

    df = _features_df(spark, n=90, classes=3)
    # skew the priors: drop most of class 2
    train = df.where((F.col("label") != 2) | (F.col("vec_id") < 9))
    m = DummyClassifier(3).fit(train)
    n2 = 3  # 9 of 90 ids are <9 with label 2 → 3 rows (ids 2,5,8)
    tot = train.count()
    assert m.priors[2] == pytest.approx(n2 / tot)
    out = m.predict_proba(df.limit(5)).select("probs", "pred").first()
    assert sum(out["probs"]) == pytest.approx(1.0)
    assert out["pred"] == int(np.argmax(m.priors))


@pytest.mark.parametrize("name", ["maxent", "trees", "mlp", "gbt"])
def test_zoo_separable_accuracy(spark, name):
    from nessie_spark.models.zoo import ZOO

    df = _features_df(spark)
    train = df.where("vec_id % 4 != 0")
    test = df.where("vec_id % 4 = 0")
    m = ZOO[name](3).fit(train)
    out = m.predict_proba(test)
    acc = out.select(F.avg((F.col("pred") == F.col("label")).cast("double"))).first()[0]
    assert acc >= 0.9, f"{name} holdout accuracy {acc}"
    s = out.select(F.aggregate("probs", F.lit(0.0), lambda a, v: a + v).alias("s")).agg(
        F.min("s"), F.max("s")
    ).first()
    assert s[0] == pytest.approx(1.0, abs=1e-6) and s[1] == pytest.approx(1.0, abs=1e-6)


def test_bow_nb_contract(spark):
    from nessie_spark.models.zoo import BagOfWordsNB

    rows = [
        (i, ("aaa bbb" if i % 2 == 0 else "ccc ddd").split(), i % 2) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>, label int")
    m = BagOfWordsNB(2).fit(df)
    out = m.predict_proba(df)
    acc = out.select(F.avg((F.col("pred") == F.col("label")).cast("double"))).first()[0]
    assert acc == 1.0


def test_fasttext_bigram_channel_separates_word_order(spark):
    """fastText slot fidelity (fasttext_text_classifier.py wordNgrams=2):
    the two classes have IDENTICAL unigram multisets and differ only in
    adjacent word order, so an order-blind bag (bow_nb) is at chance while
    the uni+bigram hash separates them."""
    from nessie_spark.models.zoo import BagOfWordsNB, FastTextClassifier

    rows = []
    for i in range(120):
        core = ["alpha", "beta"] if i % 2 == 0 else ["beta", "alpha"]
        filler = [f"w{(i + j) % 5}" for j in range(3)]
        rows.append((i, filler[:1] + core + filler[1:], i % 2))
    df = spark.createDataFrame(rows, "vec_id long, tokens array<string>, label int")
    train, test = df.where("vec_id % 3 != 0"), df.where("vec_id % 3 = 0")

    ft = FastTextClassifier(2).fit(train).predict_proba(test)
    acc = ft.select(F.avg((F.col("pred") == F.col("label")).cast("double"))).first()[0]
    assert acc >= 0.95, f"fasttext holdout accuracy {acc}"
    s = ft.select(F.aggregate("probs", F.lit(0.0), lambda a, v: a + v).alias("s")).agg(
        F.min("s"), F.max("s")
    ).first()
    assert s[0] == pytest.approx(1.0, abs=1e-6) and s[1] == pytest.approx(1.0, abs=1e-6)

    nb = BagOfWordsNB(2).fit(train).predict_proba(test)
    nb_acc = nb.select(F.avg((F.col("pred") == F.col("label")).cast("double"))).first()[0]
    assert nb_acc <= 0.7, f"order-blind bag should be ~chance, got {nb_acc}"


def test_fasttext_degenerate_token_arrays(spark):
    """0- and 1-token rows produce no bigrams (clamped slices), not errors."""
    from nessie_spark.models.zoo import FastTextClassifier

    df = spark.createDataFrame(
        [(0, ["solo"], 0), (1, [], 1), (2, ["a", "b"], 0), (3, ["b", "a"], 1)],
        "vec_id long, tokens array<string>, label int",
    )
    out = FastTextClassifier(2, max_iter=5).fit(df).predict_proba(df).collect()
    assert len(out) == 4 and all(len(r["probs"]) == 2 for r in out)


def test_cross_val_predict_covers_every_row_once(spark):
    from nessie_spark.models.cv import cross_val_predict
    from nessie_spark.models.zoo import DummyClassifier

    df = _features_df(spark, n=100, classes=4)
    out = cross_val_predict(df, DummyClassifier(4), "vec_id", k=5).cache()
    assert out.count() == 100
    assert out.select("vec_id").distinct().count() == 100
    # stratified: each (label, fold) cell is n/(classes*k) ± 1
    cells = out.groupBy("label", "fold").count().collect()
    assert len(cells) == 20 and all(abs(r["count"] - 5) <= 1 for r in cells)


# ---------------------------------------------------------------------------
# 2PL IRT twin
# ---------------------------------------------------------------------------

def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _numpy_response_matrix(vec_ids, M):
    Y = np.zeros((len(vec_ids), M))
    for r, vid in enumerate(vec_ids):
        v = str(vid)
        inv = _h64(f"inv|{v}") % 23 == 0
        d = (_h64(f"diff|{v}") % 1000) / 1000.0
        for m in range(M):
            s_m = (m + 1) / (M + 1)
            if inv:
                Y[r, m] = 1.0 if s_m < 0.5 else 0.0
            else:
                noise = (_h64(f"n|{m}|{v}") % 1000) / 1000.0 * 0.4 - 0.2
                Y[r, m] = 1.0 if (s_m - d + noise) > 0 else 0.0
    return Y


def _numpy_fit_2pl(Y, n_iter, lr):
    n, M = Y.shape
    a = np.ones(n)
    b = np.zeros(n)
    theta = np.zeros(M)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(a[:, None] * (theta[None, :] - b[:, None]))))
        resid = Y - p
        ga = (resid * (theta[None, :] - b[:, None])).sum(axis=1)
        gb = -a * resid.sum(axis=1)
        gt = (resid * a[:, None]).sum(axis=0)
        a = a + lr / M * ga
        b = b + lr / M * gb
        theta = theta + lr / n * gt
        theta = theta - theta.mean()
    return a, b, theta


def test_irt_2pl_matches_numpy_twin(spark):
    from nessie_spark.operators.modelzoo import (
        IRT_ITERS, IRT_LR, IRT_M, fit_2pl, irt_response_matrix,
    )

    items = irt_response_matrix(spark, SF)
    fitted, theta = fit_2pl(items)
    rows = sorted(fitted.select("vec_id", "y", "a", "b").collect(), key=lambda r: r["vec_id"])
    vec_ids = [r["vec_id"] for r in rows]

    Y = _numpy_response_matrix(vec_ids, IRT_M)
    got_Y = np.array([r["y"] for r in rows])
    assert np.array_equal(Y, got_Y), "deterministic response matrix diverged"

    a, b, th = _numpy_fit_2pl(Y, IRT_ITERS, IRT_LR)
    np.testing.assert_allclose([r["a"] for r in rows], a, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose([r["b"] for r in rows], b, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(theta, th, rtol=1e-8, atol=1e-9)
    # ability ordering recovered: stronger planted models → higher theta
    assert list(np.argsort(th)) == list(range(IRT_M))


def test_irt_2pl_flags_planted_inverted_items(spark):
    from nessie_spark.operators.modelzoo import irt_2pl_discrimination_flags

    out = irt_2pl_discrimination_flags(spark, SF).cache()
    flagged = {r["vec_id"] for r in out.where("flag").collect()}
    inverted = {
        r["vec_id"]
        for r in out.collect()
        if _h64(f"inv|{r['vec_id']}") % 23 == 0
    }
    assert inverted, "fixture must plant at least one inverted item"
    hit = len(flagged & inverted) / len(inverted)
    assert hit >= 0.8, f"only {hit:.0%} of planted negative-disc items flagged"
    # and negative discrimination should be rare among normal items
    fp = len(flagged - inverted) / max(1, out.count() - len(inverted))
    assert fp <= 0.2, f"false-flag rate {fp:.0%}"


def test_repeated_probas_real_repetition(spark):
    """O4/O5: the T seeded fits must genuinely differ (otherwise it's the
    r1 deterministic-slices stand-in again) and the score must equal the
    entropy of the mean distribution (dropout_uncertainty.py:79-92)."""
    import math

    from nessie_spark.operators.modelzoo import model_zoo_repeated_probas

    out = model_zoo_repeated_probas(spark, SF).collect()
    assert len(out) == 125  # vec_id % 4 == 0 of 500
    assert all(r["score"] >= -1e-9 for r in out)
    assert len({round(r["score"], 6) for r in out}) > 10  # non-degenerate


def test_repeated_probas_runs_differ(spark):
    from pyspark.sql import functions as F

    from nessie_spark.models.zoo import GradientTreeClassifier
    from nessie_spark.operators.modelzoo import N_CLASSES, _emb_features

    df = _emb_features(spark, SF)
    train = df.where("vec_id % 4 != 0")
    ev = df.where("vec_id % 4 = 0")
    p1 = GradientTreeClassifier(N_CLASSES, seed=1000).fit(train).predict_proba(ev)
    p2 = GradientTreeClassifier(N_CLASSES, seed=1001).fit(train).predict_proba(ev)
    j = p1.select("vec_id", F.col("probs").alias("a")).join(
        p2.select("vec_id", F.col("probs").alias("b")), "vec_id"
    )
    ndiff = j.where(F.col("a") != F.col("b")).count()
    assert ndiff > 0, "differently-seeded forests produced identical probas"

"""Parity: nessie_spark.api facade ≡ the oracle-green query registry.

Each facade detector is fed the same logical input the query-registry
implementation reads from the shared fixtures, and the outputs must match
row-for-row (scores rounded to 6 like the oracle discipline). Since every
query implementation is hash-verified against its DuckDB oracle, passing
here pins the facade to the oracles transitively.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nessie_spark import api
from nessie_spark.functions.core import softmax_arr
from nessie_spark.operators.common import T

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return T(spark, SF, "documents")


def _score_map(df, id_col, col, ndigits=6):
    return {
        r[id_col]: (round(r[col], ndigits) if isinstance(r[col], float) else r[col])
        for r in df.select(id_col, col).collect()
    }


def test_retag_flag_and_correct(spark):
    df = spark.createDataFrame(
        [(1, "a", "a"), (2, "a", "b")], "instance_id long, label string, prediction string"
    )
    out = api.Retag().score(df)
    assert _score_map(out, "instance_id", "flag") == {1: False, 2: True}
    cor = api.Retag().correct(df)
    assert _score_map(cor, "instance_id", "corrected") == {1: "a", 2: "b"}


def test_majority_label_baseline_matches_query(spark):
    from nessie_spark.operators.detectors import majority_label_flags

    want = _score_map(majority_label_flags(spark, SF), "doc_id", "flag")
    got = _score_map(
        api.MajorityLabelBaseline(text_col="text", label_col="lang").score(_docs(spark)),
        "doc_id",
        "flag",
    )
    assert got == want


def test_majority_per_surface_matches_query(spark):
    from nessie_spark.operators.detectors import majority_per_surface_flags

    q = majority_per_surface_flags(spark, SF)
    det = api.MajorityLabelPerSurfaceFormBaseline(
        text_col="source", label_col="lang", lowercase=False
    )
    assert _score_map(det.score(_docs(spark)), "doc_id", "flag") == _score_map(
        q, "doc_id", "flag"
    )
    assert _score_map(det.correct(_docs(spark)), "doc_id", "corrected") == _score_map(
        q, "doc_id", "corrected"
    )


def test_label_entropy_matches_query(spark):
    from nessie_spark.operators.detectors import label_entropy_scores

    want = _score_map(label_entropy_scores(spark, SF), "doc_id", "score")
    got = _score_map(
        api.LabelEntropy(text_col="source", label_col="lang", lowercase=False).score(
            _docs(spark)
        ),
        "doc_id",
        "score",
    )
    assert got == want


def test_weighted_discrepancy_matches_query(spark):
    from nessie_spark.operators.detectors import weighted_discrepancy_scores

    want = _score_map(weighted_discrepancy_scores(spark, SF), "doc_id", "score")
    got = _score_map(
        api.WeightedDiscrepancy(text_col="source", label_col="lang", lowercase=False).score(
            _docs(spark)
        ),
        "doc_id",
        "score",
    )
    assert got == want


def _probs(spark):
    from nessie_spark.operators.probability import _probs_df

    return _probs_df(spark, SF)


def test_classification_entropy_matches_query(spark):
    from nessie_spark.operators.probability import classification_entropy_scores

    want = _score_map(classification_entropy_scores(spark, SF), "vec_id", "score")
    got = _score_map(
        api.ClassificationEntropy(probs_col="probs").score(_probs(spark)), "vec_id", "score"
    )
    assert got == want


def test_classification_uncertainty_matches_query(spark):
    from nessie_spark.operators.probability import classification_uncertainty_scores

    want = _score_map(classification_uncertainty_scores(spark, SF), "vec_id", "score")
    got = _score_map(
        api.ClassificationUncertainty(probs_col="probs", label_col="noisy").score(
            _probs(spark)
        ),
        "vec_id",
        "score",
    )
    assert got == want


def test_classification_uncertainty_classes_list(spark):
    df = spark.createDataFrame(
        [(1, "b", [0.2, 0.5, 0.3])],
        "instance_id long, label string, probabilities array<double>",
    )
    out = api.ClassificationUncertainty(classes=["a", "b", "c"]).score(df)
    assert out.first()["score"] == pytest.approx(0.5)


def test_prediction_margin_matches_query(spark):
    from nessie_spark.operators.probability import prediction_margin_scores

    want = _score_map(prediction_margin_scores(spark, SF), "vec_id", "score")
    got = _score_map(
        api.PredictionMargin(probs_col="probs").score(_probs(spark)), "vec_id", "score"
    )
    assert got == want


def _sm_slice(lo: int):
    return softmax_arr(F.transform(F.slice("embedding", lo, 4), lambda v: v.cast("double")))


def test_dropout_uncertainty_matches_query(spark):
    from nessie_spark.operators.detectors3 import dropout_uncertainty_scores

    emb = T(spark, SF, "embeddings").select(
        "vec_id", F.array(_sm_slice(1), _sm_slice(5), _sm_slice(9)).alias("rep")
    )
    want = _score_map(dropout_uncertainty_scores(spark, SF), "vec_id", "score")
    got = _score_map(
        api.DropoutUncertainty(repeated_probs_col="rep").score(emb), "vec_id", "score"
    )
    assert got == want


def test_datamap_confidence_matches_query(spark):
    from nessie_spark.operators.detectors2 import datamap_confidence_scores

    emb = T(spark, SF, "embeddings").select(
        "vec_id",
        (F.col("label") % 4).cast("int").alias("noisy"),
        F.array(_sm_slice(1), _sm_slice(5), _sm_slice(9)).alias("eps"),
    )
    want = _score_map(datamap_confidence_scores(spark, SF), "vec_id", "score")
    got = _score_map(
        api.DataMapConfidence(epoch_probs_col="eps", label_idx_col="noisy").score(emb),
        "vec_id",
        "score",
    )
    assert got == want


def test_borda_count_matches_query(spark):
    from nessie_spark.operators.detectors import borda_count_scores

    scored = _docs(spark).select(
        "doc_id",
        F.array(
            F.col("n_chars").cast("double"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("double"),
            F.size(F.array_distinct(F.split(F.trim("text"), r"\s+"))).cast("double"),
        ).alias("ens"),
    )
    want = _score_map(borda_count_scores(spark, SF), "doc_id", "borda")
    got = _score_map(
        api.BordaCount(id_col="doc_id", scores_col="ens").score(scored), "doc_id", "score"
    )
    assert got == want


@pytest.mark.parametrize(
    "metric,query",
    [
        ("euclidean", "mean_distance_scores"),
        ("cosine", "mean_distance_cosine_scores"),
        ("dot", "mean_distance_dot_scores"),
    ],
)
def test_mean_distance_matches_query(spark, metric, query):
    from nessie_spark.operators import probability as P

    emb = T(spark, SF, "embeddings")
    want = _score_map(getattr(P, query)(spark, SF), "vec_id", "score")
    got = _score_map(
        api.MeanDistance(label_col="label", emb_col="embedding", metric=metric).score(emb),
        "vec_id",
        "score",
    )
    assert got == want


def test_majority_voting_ensemble_matches_query(spark):
    from nessie_spark.operators.probability import ensemble_majority_flags

    def pred(lo: int):
        sl = F.transform(F.slice("embedding", lo, 4), lambda v: v.cast("double"))
        return (F.array_position(sl, F.array_max(sl)) - 1).cast("int")

    emb = T(spark, SF, "embeddings").select(
        "vec_id",
        (F.col("label") % 4).alias("noisy"),
        F.array(pred(1), pred(5), pred(9)).alias("ens"),
    )
    q = ensemble_majority_flags(spark, SF)
    det = api.MajorityVotingEnsemble(id_col="vec_id", label_col="noisy", preds_col="ens")
    assert _score_map(det.score(emb), "vec_id", "flag") == _score_map(q, "vec_id", "flag")
    assert _score_map(det.correct(emb), "vec_id", "corrected") == _score_map(
        q, "vec_id", "corrected"
    )


def test_mean_distance_rejects_unknown_metric():
    with pytest.raises(ValueError):
        api.MeanDistance(metric="manhattan")


def test_detector_kinds():
    assert api.Retag().kind == "flagger"
    assert api.LabelEntropy().kind == "scorer"
    assert api.Retag().supports_correction()
    assert not api.PredictionMargin().supports_correction()


def test_knn_flagger_matches_query(spark):
    from nessie_spark.operators.probability import knn_flagger_flags

    emb = T(spark, SF, "embeddings")
    want = _score_map(knn_flagger_flags(spark, SF), "vec_id", "flag")
    got = _score_map(
        api.KnnFlagger(id_col="vec_id", label_col="label", emb_col="embedding", k=5).score(
            emb
        ),
        "vec_id",
        "flag",
    )
    assert got == want


def test_knn_entropy_matches_query(spark):
    from nessie_spark.operators.probability import knn_entropy_scores

    emb = T(spark, SF, "embeddings")
    want = _score_map(knn_entropy_scores(spark, SF), "vec_id", "score")
    got = _score_map(
        api.KnnEntropy(id_col="vec_id", label_col="label", emb_col="embedding", k=5).score(
            emb
        ),
        "vec_id",
        "score",
    )
    assert got == want


def test_confident_learning_matches_query(spark):
    from nessie_spark.operators.detectors2 import confident_learning_flags

    want = _score_map(confident_learning_flags(spark, SF), "vec_id", "flag")
    got = _score_map(
        api.ConfidentLearning(probs_col="probs", label_col="noisy").score(_probs(spark)),
        "vec_id",
        "flag",
    )
    assert got == want


def _votes_arr(spark):
    from nessie_spark.operators.detectors3 import _votes

    return _votes(spark, SF).select(
        "vec_id", "noisy", F.array("v1", "v2", "v3").alias("votes")
    )


def test_label_aggregation_matches_query(spark):
    from nessie_spark.operators.detectors3 import DS_ITERS, dawid_skene_labels

    q = dawid_skene_labels(spark, SF)
    det = api.LabelAggregation(
        id_col="vec_id", label_col="noisy", votes_col="votes", n_classes=4, iters=DS_ITERS
    )
    v = _votes_arr(spark)
    assert _score_map(det.score(v), "vec_id", "flag") == _score_map(q, "vec_id", "flag")
    assert _score_map(det.correct(v), "vec_id", "corrected") == _score_map(
        q, "vec_id", "adjudicated"
    )


def test_irt_flagger_matches_query(spark):
    from nessie_spark.operators.detectors3 import item_discrimination_flags

    q = item_discrimination_flags(spark, SF)
    out = api.ItemResponseTheoryFlagger(
        id_col="vec_id", label_col="noisy", preds_col="votes"
    ).score(_votes_arr(spark))
    want_flag = _score_map(q, "vec_id", "flag")
    want_disc = _score_map(q, "vec_id", "disc")
    got = {r.vec_id: (r.flag, r.disc) for r in out.select("vec_id", "flag", "disc").collect()}
    assert {k: v[0] for k, v in got.items()} == want_flag
    for k, (_, d) in got.items():
        assert d == pytest.approx(want_disc[k], abs=1e-6)


def test_cross_validation_helper(spark):
    from nessie_spark.models.zoo import DummyClassifier

    emb = T(spark, SF, "embeddings").select(
        "vec_id",
        F.transform(F.slice("embedding", 1, 8), lambda v: v.cast("double")).alias("features"),
        (F.col("label") % 4).cast("int").alias("label"),
    )
    out = api.CrossValidationHelper(n_splits=3, id_col="vec_id").run(emb, DummyClassifier(4))
    rows = out.select("vec_id", "fold", "pred", "probs").collect()
    assert len(rows) == emb.count()
    assert {r.fold for r in rows} == {0, 1, 2}
    assert all(len(r.probs) == 4 for r in rows)


@pytest.fixture(scope="module")
def vngram_df(spark):
    """'the old man' repeats 3x: twice tagged DT,JJ,NN and once DT,NN,VB
    (the minority). Sub-repeats ('the old', 'old man') are NOT maximal:
    'old man' always has left neighbor 'the', 'the old' always has right
    neighbor 'man' — the diversity criterion must exclude them, so flags
    come ONLY from the full 3-gram."""
    rows = [
        (0, ["the", "old", "man", "sat"], ["DT", "JJ", "NN", "VB"]),
        (1, ["see", "the", "old", "man"], ["VB", "DT", "JJ", "NN"]),
        (2, ["the", "old", "man", "ran"], ["DT", "NN", "VB", "VB"]),
        (3, ["unrelated"], ["NN"]),
        (4, [], []),
    ]
    return spark.createDataFrame(
        rows, "sent_id long, toks array<string>, tags array<string>"
    )


def test_variation_ngrams_flags_minority_positions(spark, vngram_df):
    det = api.VariationNGrams(id_col="sent_id", tokens_col="toks", tags_col="tags")
    out = {r.sent_id: r.flags for r in det.score(vngram_df).collect()}
    assert out[0] == [False, False, False, False]
    assert out[1] == [False, False, False, False]
    assert out[2] == [False, True, True, False]  # JJ->NN, NN->VB disagree
    assert out[3] == [False]
    assert out[4] == []


def test_variation_ngrams_correct_applies_majority(spark, vngram_df):
    det = api.VariationNGrams(id_col="sent_id", tokens_col="toks", tags_col="tags")
    out = {r.sent_id: r.corrected for r in det.correct(vngram_df).collect()}
    assert out[2] == ["DT", "JJ", "NN", "VB"]
    assert out[0] == ["DT", "JJ", "NN", "VB"]  # untouched
    assert out[4] == []


def test_variation_ngrams_submaximal_excluded(spark):
    """Both occurrences of 'b c' extend identically ('a' left, 'd' right)
    -> not maximal -> no flags even though tag sequences differ; the
    enclosing maximal 4-gram disagrees in 2 positions and flags them."""
    rows = [
        (0, ["a", "b", "c", "d"], ["T1", "T2", "T3", "T4"]),
        (1, ["a", "b", "c", "d"], ["T1", "T2", "X3", "X4"]),
    ]
    df = spark.createDataFrame(rows, "sent_id long, toks array<string>, tags array<string>")
    out = {
        r.sent_id: r.flags
        for r in api.VariationNGrams(
            id_col="sent_id", tokens_col="toks", tags_col="tags"
        ).score(df).collect()
    }
    # majority between the two 4-gram annotations ties -> smallest tagseq
    # wins deterministically (T1,T2,T3,T4 < T1,T2,X3,X4), flagging row 1
    assert out[0] == [False, False, False, False]
    assert out[1] == [False, False, True, True]


def test_projection_ensemble_matches_query(spark):
    from nessie_spark.operators.detectors3 import projection_ensemble_flags

    emb = T(spark, SF, "embeddings").select(
        "vec_id", (F.col("label") % 4).cast("int").alias("noisy"), "embedding"
    )
    q = projection_ensemble_flags(spark, SF)
    det = api.MaxEntProjectionEnsemble(
        id_col="vec_id", label_col="noisy", features_col="embedding",
        n_models=3, n_classes=4, seed="proj",
    )
    assert _score_map(det.score(emb), "vec_id", "flag") == _score_map(q, "vec_id", "flag")
    assert _score_map(det.correct(emb), "vec_id", "corrected") == _score_map(
        q, "vec_id", "vote"
    )


def test_percentage_flagged_metric(spark):
    df = spark.createDataFrame(
        [(i, i % 4 == 0) for i in range(8)], "instance_id long, flag boolean"
    )
    row = api.percentage_flagged(df).first()
    assert row.n == 8 and row.flagged_fraction == pytest.approx(0.25)


def test_unknown_label_raises_with_classes(spark):
    df = spark.createDataFrame(
        [(1, "d", [0.2, 0.5, 0.3])],
        "instance_id long, label string, probabilities array<double>",
    )
    out = api.ClassificationUncertainty(classes=["a", "b", "c"]).score(df)
    with pytest.raises(Exception, match="label not in classes"):
        out.collect()


def test_empty_ensemble_row_survives_with_null_flag(spark):
    df = spark.createDataFrame(
        [(1, "a", ["a", "a", "b"]), (2, "a", [])],
        "instance_id long, label string, ensemble_predictions array<string>",
    )
    out = {
        r.instance_id: r.flag
        for r in api.MajorityVotingEnsemble().score(df).collect()
    }
    assert out == {1: False, 2: None}  # row 2 kept, flag NULL
    borda = api.BordaCount(scores_col="s").score(
        df.withColumn("s", F.when(F.col("instance_id") == 1, F.array(F.lit(1.0))))
    )
    assert {r.instance_id: r.score for r in borda.collect()} == {1: 1, 2: None}


def test_variation_ngrams_string_ids(spark):
    rows = [
        ("s0", ["x", "y"], ["A", "B"]),
        ("s1", ["x", "y"], ["A", "C"]),
        ("s2", ["x", "y"], ["A", "B"]),
    ]
    df = spark.createDataFrame(rows, "sent_id string, toks array<string>, tags array<string>")
    out = {
        r.sent_id: r.flags
        for r in api.VariationNGrams(
            id_col="sent_id", tokens_col="toks", tags_col="tags", n_max=2
        ).score(df).collect()
    }
    assert out == {"s0": [False, False], "s1": [False, True], "s2": [False, False]}

"""Model-zoo + IRT-2PL queries (SURVEY.md §2.7 O14, O9 upgrade).

O14 model zoo: reference /root/reference/nessie/models/ — sklearn/flair/
transformer classifiers behind the Model contract (model.py:11-43), fitted
per CV fold by CrossValidationHelper (helper.py:138-256). Grafted as
pyspark.ml estimators behind nessie_spark.models.zoo.SparkModel, fitted by
nessie_spark.models.cv.cross_val_predict (see those modules).

O9 full graft: ItemResponseTheoryFlagger
(/root/reference/nessie/detectors/irt.py:17-73) fits a 2PL IRT model —
P(model m answers item i correctly) = sigmoid(a_i * (theta_m - b_i)) — to
the ensemble-correctness matrix and flags items with NEGATIVE
discrimination a_i < 0 (irt.py:73). The reference optimizes by Pyro SVI
(10k Adam steps on one GPU/CPU); the engine fits the same likelihood by
full-batch alternating gradient ascent where each iteration is ONE
distributed scan: item parameters (a_i, b_i) live as columns updated by
per-row array math, subject abilities (theta_m, M = ensemble size, tiny)
live on the driver and are re-broadcast as literals — so the per-iteration
plan is a zero-shuffle map plus one partial-aggregated M-slot reduce.
localCheckpoint every few iterations truncates the growing lineage (the
same discipline as the Dawid–Skene EM loop, detectors3.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from nessie_spark.functions.core import h64
from nessie_spark.operators.common import T, h64_sql

K_FOLDS = 5
N_CLASSES = 10  # embeddings.label ∈ [0, 10)

# --- 2PL constants (deterministic fixture + fit schedule) ------------------
IRT_M = 4          # ensemble size (subjects)
IRT_ITERS = 24     # full-batch gradient iterations
IRT_LR = 0.8       # learning rate (normalized by M resp. N per side)
IRT_CKPT = 6       # localCheckpoint cadence


# ---------------------------------------------------------------------------
# O14 — model zoo over CV folds
# ---------------------------------------------------------------------------

def _emb_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label").cast("int").alias("label"),
    )


def model_zoo_dummy_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DummyClassifier out-of-fold predictions (zoo baseline slot,
    dummy_text_classifier.py:12-37; CV loop helper.py:208-256). The fitted
    state is the train-fold class priors, so the whole CV run is exactly
    SQL-expressible → oracle-checked. p_pred = prior of the argmax class
    (single int/int division — bit-identical across engines)."""
    from nessie_spark.models.cv import cross_val_predict
    from nessie_spark.models.zoo import DummyClassifier

    df = _emb_features(spark, sf_dir)
    out = cross_val_predict(df, DummyClassifier(N_CLASSES), "vec_id", K_FOLDS)
    return out.select(
        "vec_id",
        "fold",
        "pred",
        F.round(F.element_at("probs", F.col("pred") + 1), 6).alias("p_pred"),
        (F.col("pred") != F.col("label")).alias("flag"),
    ).orderBy("vec_id")


MODEL_ZOO_DUMMY_CV_SQL = f"""
WITH d AS (
  SELECT vec_id, label,
         CAST((ROW_NUMBER() OVER (PARTITION BY label
              ORDER BY {h64_sql(x="'fold|' || CAST(vec_id AS VARCHAR)")} ASC, vec_id ASC) - 1)
              % {K_FOLDS} AS INT) AS fold
  FROM embeddings
),
folds AS (SELECT DISTINCT fold FROM d),
counts AS (SELECT fold, label, COUNT(*) AS n FROM d GROUP BY fold, label),
train AS (
  SELECT f.fold AS eval_fold, c.label, CAST(SUM(c.n) AS BIGINT) AS n
  FROM counts c JOIN folds f ON c.fold <> f.fold
  GROUP BY f.fold, c.label
),
best AS (
  SELECT eval_fold, label AS pred, n,
         CAST(SUM(n) OVER (PARTITION BY eval_fold) AS BIGINT) AS total,
         ROW_NUMBER() OVER (PARTITION BY eval_fold ORDER BY n DESC, label ASC) AS rk
  FROM train
)
SELECT d.vec_id, d.fold, CAST(b.pred AS INT) AS pred,
       ROUND(CAST(b.n AS DOUBLE) / CAST(b.total AS DOUBLE), 6) AS p_pred,
       (b.pred <> d.label) AS flag
FROM d JOIN best b ON b.eval_fold = d.fold AND b.rk = 1
ORDER BY d.vec_id
"""


def model_zoo_maxent_cv_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxEnt zoo slot over CV folds (maxent_text_classifier.py:8-11 →
    pyspark.ml LogisticRegression; CV loop helper.py:208-256), feeding the
    Retag-style flag (pred ≠ noisy). LBFGS treeAggregate float order is not
    bit-stable across engines → rows-only driver gate; semantics gated in
    pytest (holdout accuracy on a separable fixture)."""
    from nessie_spark.models.cv import cross_val_predict
    from nessie_spark.models.zoo import MaxEntClassifier

    df = _emb_features(spark, sf_dir)
    out = cross_val_predict(df, MaxEntClassifier(N_CLASSES, max_iter=25), "vec_id", K_FOLDS)
    return out.select(
        "vec_id", "fold", "pred", (F.col("pred") != F.col("label")).alias("flag")
    ).orderBy("vec_id")


def _docs_lang_tokens(spark: SparkSession, sf_dir: str):
    """Shared text-task framing for the classic-text zoo slots (bow_nb and
    fasttext stay directly comparable because this is ONE function):
    tokens = lower/trim whitespace split, label = dense lang index
    (deterministic row_number over the distinct langs). Returns
    (DataFrame[doc_id, tokens, label], n_classes)."""
    docs = T(spark, sf_dir, "documents")
    # unpartitioned window is safe here: the frame is the DISTINCT langs
    # (bounded by the 5-language lexicon), not the corpus
    langs = docs.select("lang").distinct().withColumn(
        "label", (F.row_number().over(Window.orderBy("lang")) - 1).cast("int")
    )
    n_cls = langs.count()
    df = (
        docs.join(F.broadcast(langs), "lang")
        .select(
            "doc_id",
            F.split(F.lower(F.trim("text")), r"\s+").alias("tokens"),
            "label",
        )
    )
    return df, n_cls


def model_zoo_bow_nb_cv_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words NaiveBayes zoo slot (fasttext role) on the documents
    table: tokens = whitespace split, label = dense lang index (deterministic
    row_number over the distinct langs). Rows-only gate (float posteriors);
    pytest gates the contract."""
    from nessie_spark.models.cv import cross_val_predict
    from nessie_spark.models.zoo import BagOfWordsNB

    df, n_cls = _docs_lang_tokens(spark, sf_dir)
    out = cross_val_predict(df, BagOfWordsNB(n_cls), "doc_id", K_FOLDS)
    return out.select(
        "doc_id", "fold", "pred", (F.col("pred") != F.col("label")).alias("flag")
    ).orderBy("doc_id")


def model_zoo_fasttext_cv_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText zoo slot (fasttext_text_classifier.py:20-37, wordNgrams=2
    + bucket hashing + linear softmax → nessie_spark.models.zoo
    FastTextClassifier) on the documents table: tokens = whitespace split,
    label = dense lang index — the same task framing as the bow_nb slot so
    the two classic-text models are directly comparable. Rows-only gate
    (L-BFGS floats); pytest gates the contract and that the bigram channel
    genuinely contributes."""
    from nessie_spark.models.cv import cross_val_predict
    from nessie_spark.models.zoo import FastTextClassifier

    df, n_cls = _docs_lang_tokens(spark, sf_dir)
    # smaller solver budget than the class defaults and 3 folds: the gate
    # checks the distributed CV plumbing, not squeezed accuracy (pytest owns
    # semantics); each L-BFGS iteration is a fixed-overhead treeAggregate
    # round, so iters×folds is the whole wall-clock at gate scale
    out = cross_val_predict(
        df, FastTextClassifier(n_cls, n_buckets=1 << 12, max_iter=6), "doc_id", 3
    )
    return out.select(
        "doc_id", "fold", "pred", (F.col("pred") != F.col("label")).alias("flag")
    ).orderBy("doc_id")


def model_zoo_repeated_probas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/O5 with REAL repeated inference: the reference's
    CrossValidationHelper collects T repeated probability runs per item
    (helper.py:168-199, num_repetitions) and DropoutUncertainty scores the
    entropy of the MEAN distribution across runs
    (dropout_uncertainty.py:79-92). Monte-Carlo dropout's role — T
    decorrelated predictors from one training setup — is played here by
    T independently-seeded RandomForest fits (each a distributed tree
    build); score = entropy(mean_t probs_t). Rows-only gate (tree-ensemble
    floats); pytest asserts the runs genuinely differ and the score
    matches the entropy of the mean."""
    from nessie_spark.models.zoo import GradientTreeClassifier

    T_REPS = 3
    df = _emb_features(spark, sf_dir)
    train = df.where(F.col("vec_id") % 4 != 0)
    ev = df.where(F.col("vec_id") % 4 == 0)
    out = None
    for t in range(T_REPS):
        m = GradientTreeClassifier(N_CLASSES, seed=1000 + t).fit(train)
        p = m.predict_proba(ev).select(
            "vec_id", "label", F.col("probs").alias(f"p{t}")
        )
        out = p if out is None else out.join(p.drop("label"), "vec_id")
    # mean built by folding over ALL T_REPS run columns — hard-coding
    # p0..p2 would silently ignore extra runs (and mis-divide) if T_REPS
    # is ever tuned
    acc = F.col("p0")
    for t in range(1, T_REPS):
        acc = F.zip_with(acc, F.col(f"p{t}"), lambda a, b: a + b)
    mean = F.transform(acc, lambda s: s / T_REPS)
    score = -F.aggregate(
        mean, F.lit(0.0), lambda acc, m: acc + m * F.log(m + F.lit(1e-300))
    )
    return (
        out.withColumn("score", F.round(score, 6))
        .select("vec_id", "label", "score")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# O9 — 2PL IRT via distributed alternating gradient ascent
# ---------------------------------------------------------------------------

def _u01(tag: str, *cols) -> F.Column:
    """Deterministic uniform [0,1) from the engine hash rule."""
    return (F.pmod(h64(F.concat_ws("|", F.lit(tag), *cols)), F.lit(1000)) / 1000.0)


def irt_response_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble-correctness matrix (irt.py:44-50: data =
    (ensemble_predictions == labels)). The engine's deterministic ensemble:
    model m has ability s_m = (m+1)/(M+1); item i has difficulty
    d_i ~ U[0,1) and per-(i,m) noise ~ U[-0.2,0.2), both seeded hashes of
    the ids; y = 1 iff s_m - d_i + noise > 0. Items with
    h64('inv|'||vec_id) % 23 == 0 are planted ANTI-DISCRIMINATING —
    exactly the weak half of the ensemble answers them correctly
    (y = 1 iff s_m < 0.5), the cleanest negative-discrimination pattern —
    the set the flagger must find. (A plain y-inversion is NOT used: an
    extreme-difficulty item is all-0/all-1 either way and carries no
    discrimination signal.) Output: vec_id, y array<double>[M]."""
    vid = F.col("vec_id").cast("string")
    inv = F.pmod(h64(F.concat(F.lit("inv|"), vid)), F.lit(23)) == 0
    ys = []
    for m in range(IRT_M):
        s_m = (m + 1) / (IRT_M + 1)
        raw = (
            F.lit(s_m) - _u01("diff", vid) + _u01("n", F.lit(str(m)), vid) * 0.4 - 0.2
        ) > 0
        ys.append(
            F.when(inv, F.lit(1.0 if s_m < 0.5 else 0.0)).otherwise(raw.cast("double"))
        )
    return T(spark, sf_dir, "embeddings").select("vec_id", F.array(*ys).alias("y"))


def fit_2pl(items: DataFrame, n_iter: int = IRT_ITERS, lr: float = IRT_LR):
    """Full-batch gradient MLE of the 2PL likelihood (see module
    docstring). ``items`` = (vec_id, y: array<double>[M]). Returns
    (item_params DataFrame (vec_id, a, b), theta list[M]).

    Per iteration (simultaneous update, like the twin in tests):
      resid_{i,m} = y_{i,m} - sigmoid(a_i (theta_m - b_i))   [per-row map]
      a_i += lr/M * Σ_m resid_{i,m} (theta_m - b_i)          [per-row]
      b_i += lr/M * (-a_i) Σ_m resid_{i,m}                   [per-row]
      theta_m += lr/N * Σ_i resid_{i,m} a_i                  [M-slot reduce]
      theta -= mean(theta)      [identifiability: location is not
                                 determined by the likelihood]
    """
    M = IRT_M
    cur = items.select(
        "vec_id", "y", F.lit(1.0).alias("a"), F.lit(0.0).alias("b")
    ).localCheckpoint()
    n = cur.count()
    theta = [0.0] * M
    for it in range(n_iter):
        th = F.array(*[F.lit(t) for t in theta])
        p = F.transform(
            th, lambda t: 1.0 / (1.0 + F.exp(-(F.col("a") * (t - F.col("b")))))
        )
        resid = F.zip_with("y", p, lambda y, pp: y - pp)
        step = cur.withColumn("resid", resid)
        # theta gradient: one partial-aggregated reduce to M driver floats
        grads = step.agg(
            *[F.sum(F.col("resid")[m] * F.col("a")).alias(f"g{m}") for m in range(M)]
        ).collect()[0]
        ga = F.aggregate(
            F.zip_with("resid", th, lambda r, t: r * (t - F.col("b"))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        gb = -F.col("a") * F.aggregate(
            "resid", F.lit(0.0), lambda acc, v: acc + v
        )
        cur = step.select(
            "vec_id",
            "y",
            (F.col("a") + F.lit(lr / M) * ga).alias("a"),
            (F.col("b") + F.lit(lr / M) * gb).alias("b"),
        )
        theta = [theta[m] + lr / n * grads[f"g{m}"] for m in range(M)]
        mu = sum(theta) / M
        theta = [t - mu for t in theta]
        if (it + 1) % IRT_CKPT == 0:
            cur = cur.localCheckpoint()
    return cur, theta


def irt_2pl_discrimination_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ItemResponseTheoryFlagger graft (irt.py:17-73): fit 2PL, flag
    disc < 0 (irt.py:73). Rows-only driver gate (iterative float fit);
    pytest twin asserts parameter-level agreement with an identical NumPy
    implementation and that the planted inverted items are flagged."""
    fitted, _theta = fit_2pl(irt_response_matrix(spark, sf_dir))
    return fitted.select(
        "vec_id",
        F.round("a", 6).alias("disc"),
        F.round("b", 6).alias("diff"),
        (F.col("a") < 0).alias("flag"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# O10/O11 — curriculum & Leitner spotters driven by a REAL zoo model
# ---------------------------------------------------------------------------

SPOT_EPOCHS = 3  # model-driven epochs (each = one refit + full predict)


def _spot_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _emb_features(spark, sf_dir)


def _spot_model(seed: int):
    from nessie_spark.models.zoo import GradientTreeClassifier

    return GradientTreeClassifier(N_CLASSES, n_trees=8, max_depth=4, seed=seed)


def _spot_losses(model, base: DataFrame) -> DataFrame:
    """Predict over the WHOLE dataset; loss = −ln p[noisy label] (the
    reference's per-epoch training-dynamics read, curriculum_spotter.py
    :183-199)."""
    out = model.predict_proba(base)
    return out.select(
        "vec_id", "features", "label", "pred",
        (-F.log(F.greatest(F.get("probs", F.col("label")), F.lit(1e-12)))).alias("loss"),
    ).localCheckpoint(eager=True)


def curriculum_spotter_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CurriculumSpotter driven by a REAL model (r2 VERDICT #7): per-epoch
    losses come from GradientTreeClassifier refits on the re-sampled
    subset — the reference's training dynamics
    (/root/reference/nessie/detectors/curriculum_spotter.py:132-261),
    where the deterministic stand-in (`curriculum_spotter_scores`, the
    oracle-exact query) decays losses instead of training.

    Per epoch: λ = mean loss of correctly-classified; picks = ⌊n·t/E⌋
    lowest-loss hard items; score += pick·(loss + 1/n_picks); the model
    REFITS on easy ∪ picks with an epoch-indexed seed. Rows-only gate
    (tree-ensemble floats); pytest asserts score ordering tracks planted
    label noise (tests/test_spotter_models.py)."""
    base = _spot_base(spark, sf_dir).localCheckpoint(eager=True)
    n = base.count()
    model = _spot_model(seed=42).fit(base)
    state = base.select("vec_id").withColumn("score", F.lit(0.0))
    d = None
    for t in range(1, SPOT_EPOCHS + 1):
        d = _spot_losses(model, base)
        lam = (
            d.where(F.col("pred") == F.col("label")).agg(F.avg("loss")).collect()[0][0]
        )
        lam = float("inf") if lam is None else float(lam)
        k = int(n * t / SPOT_EPOCHS)
        w = Window.partitionBy(F.col("loss") > lam).orderBy(F.asc("loss"), F.asc("vec_id"))
        dd = d.withColumn("is_hard", F.col("loss") > lam).withColumn(
            "hrk", F.row_number().over(w)
        ).withColumn("pick", F.col("is_hard") & (F.col("hrk") <= k))
        nh = dd.agg(F.sum(F.col("pick").cast("long"))).collect()[0][0] or 0
        epoch_score = dd.select(
            "vec_id",
            F.when(F.col("pick"), F.col("loss") + F.lit(1.0 / max(nh, 1))).otherwise(
                F.lit(0.0)
            ).alias("ds"),
            (~F.col("is_hard") | F.col("pick")).alias("train"),
        )
        state = (
            state.join(epoch_score, "vec_id")
            .select("vec_id", (F.col("score") + F.col("ds")).alias("score"), "train")
            .localCheckpoint(eager=True)
        )
        train_ids = state.where(F.col("train")).select("vec_id")
        model = _spot_model(seed=42 + t).fit(base.join(train_ids, "vec_id"))
        state = state.drop("train")
    final = _spot_losses(model, base).select("vec_id", F.col("loss").alias("lf"))
    return (
        state.join(final, "vec_id")
        .select(
            "vec_id",
            F.round(
                F.col("score")
                + F.when(F.col("score") == 0.0, F.col("lf")).otherwise(F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy("vec_id")
    )


LS_MODEL_QUEUES = 3


def leitner_spotter_model_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeitnerSpotter driven by a REAL model (r2 VERDICT #7; reference
    leitner_spotter.py:133-267): queue q trains on epochs divisible by
    2^q; after each epoch the model REFITS on the scheduled items
    (epoch-indexed seed) and predicts everything — correct items promote,
    wrong demote to queue 0, score += (in queue 0)·(loss + 1/|q0|).
    Rows-only gate; pytest asserts noise tracking."""
    base = _spot_base(spark, sf_dir).localCheckpoint(eager=True)
    model = _spot_model(seed=42).fit(base)
    state = base.select("vec_id").withColumn("q", F.lit(0).cast("int")).withColumn(
        "score", F.lit(0.0)
    )
    for t in range(1, SPOT_EPOCHS + 1):
        d = _spot_losses(model, base).select("vec_id", "pred", "label", "loss")
        st = state.join(d, "vec_id")
        trained = F.lit(t == 1) | (F.lit(t) % F.expr("shiftleft(1, q)") == 0)
        correct = F.col("pred") == F.col("label")
        qn = (
            F.when(trained & correct, F.least(F.col("q") + 1, F.lit(LS_MODEL_QUEUES - 1)))
            .when(trained & ~correct, F.lit(0))
            .otherwise(F.col("q"))
        ).cast("int")
        st = st.withColumn("trained", trained).withColumn("qn", qn)
        nq0 = st.agg(F.sum((F.col("qn") == 0).cast("long"))).collect()[0][0] or 0
        state = st.select(
            "vec_id",
            F.col("qn").alias("q"),
            (
                F.col("score")
                + F.when(
                    F.col("qn") == 0, F.col("loss") + F.lit(1.0 / max(nq0, 1))
                ).otherwise(F.lit(0.0))
            ).alias("score"),
        ).localCheckpoint(eager=True)
        # Refit with REPLAY: scheduled items at full weight, the rest
        # down-weighted. The reference fine-tunes one network whose weights
        # retain unscheduled items (leitner_spotter.py:147-160); a
        # from-scratch tree refit has no such retention — training on the
        # scheduled set alone (e.g. only queue-0 wrong-label items at t=3)
        # collapses the model and floods every clean item's loss. The
        # weightCol replay keeps the schedule's emphasis while preserving
        # what the model already knows.
        sched = st.select("vec_id", F.when(F.col("trained"), 1.0).otherwise(0.25).alias("_w"))
        model = _spot_model(seed=42 + t).fit(base.join(sched, "vec_id"))
    final = _spot_losses(model, base).select("vec_id", F.col("loss").alias("lf"))
    return (
        state.join(final, "vec_id")
        .select(
            "vec_id",
            F.round(
                F.col("score")
                + F.when(F.col("score") == 0.0, F.col("lf")).otherwise(F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# O2/O14 — MaxEnt sequence tagger over sentence-fold CV
# ---------------------------------------------------------------------------


def model_zoo_token_tagger_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaxEnt sequence tagger behind the P10 featurizer and the O2
    sentence-fold CV — closes r2 VERDICT "missing #4" (the token-task CV
    path previously exercised fold bookkeeping with no tagger behind it).

    Reference: models/tagging/maxent_sequence_tagger.py:14-95 (sklearn
    LogisticRegression over handcrafted per-token features) fitted by
    CrossValidationHelper.run_for_ragged (helper.py:258-351 — folds split
    on SENTENCES, predictions scattered back per token). Engine: the same
    handcrafted features (word/prefix/suffix/±1 window, util.py:5-44)
    hashed by pyspark.ml HashingTF, one LogisticRegression per fold on the
    train documents, transform on the held-out documents, union.

    Token labels are the corpus's deterministic BIO rule (runs of words of
    length ≥5 — the 'noisy' span rule shared with span_alignment). Output:
    Retag-shape flags (pred ≠ noisy). Rows-only (LBFGS floats); pytest
    gates held-out accuracy (tests/test_spotter_models.py)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    docs = T(spark, sf_dir, "documents")
    ts = F.split(F.trim("text"), r"\s+")
    ex = docs.select("doc_id", F.posexplode(ts).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    fl = F.length("word") >= 5
    feat = ex.select(
        "doc_id", "pos", "word",
        F.lag("word").over(w).alias("prev_word"),
        F.lead("word").over(w).alias("next_word"),
        fl.alias("fl"),
        F.lag(fl).over(w).alias("pfl"),
    ).select(
        "doc_id", "pos", "word", "prev_word", "next_word",
        F.when(~F.col("fl"), 0)
        .when(F.col("pfl").isNull() | ~F.col("pfl"), 1)
        .otherwise(2)
        .cast("int")
        .alias("label"),  # O/B/I
    )
    toks = F.array(
        F.concat(F.lit("w="), F.lower("word")),
        F.concat(F.lit("p3="), F.left(F.col("word"), F.lit(3))),
        F.concat(F.lit("s3="), F.right(F.col("word"), F.lit(3))),
        F.concat(F.lit("pw="), F.coalesce(F.lower("prev_word"), F.lit("^"))),
        F.concat(F.lit("nw="), F.coalesce(F.lower("next_word"), F.lit("$"))),
    )
    # fold unit = document (O2: folds split on sentences, never tokens)
    data = (
        feat.select("doc_id", "pos", "label", toks.alias("toks"))
        .withColumn(
            "fold",
            # h64, not xxhash64: every pseudo-random decision in the engine
            # derives from the md5-based h64 (functions/core.py), which has
            # a DuckDB twin — keeps this query promotable to an oracle pair
            F.pmod(
                h64(F.concat(F.lit("tagfold|"), F.col("doc_id").cast("string"))),
                F.lit(K_FOLDS),
            ).cast("int"),
        )
    )
    hdata = (
        HashingTF(inputCol="toks", outputCol="fvec", numFeatures=1 << 12)
        .transform(data)
        .localCheckpoint(eager=True)  # reused by K fits + K transforms
    )
    parts = []
    for f in range(K_FOLDS):
        lr = LogisticRegression(
            featuresCol="fvec", labelCol="label", maxIter=20, regParam=1e-3,
            family="multinomial", standardization=False,
        )
        m = lr.fit(hdata.where(F.col("fold") != f))
        pred = m.transform(hdata.where(F.col("fold") == f))
        parts.append(
            pred.select(
                "doc_id", "pos", "fold", "label",
                F.col("prediction").cast("int").alias("pred"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "doc_id", "pos", "fold",
        F.col("label").alias("noisy"), "pred",
        (F.col("pred") != F.col("label")).alias("flag"),
    ).orderBy("doc_id", "pos")


# ---------------------------------------------------------------------------
# O14 — CRF-style sequence tagger: structured perceptron, parameter mixing
# ---------------------------------------------------------------------------

CRF_D = 1 << 12  # hashed feature space (matches the MaxEnt tagger's 2^12)
CRF_L = 3  # O / B / I
CRF_SHARDS = 8
CRF_ROUNDS = 3  # parameter-mixing rounds
CRF_EPOCHS = 2  # local perceptron epochs per shard per round


def _crf_feats(words: list, i: int):
    """Hashed active-feature indices for token i — the same window the
    reference featurizer spans (models/tagging/util.py:5-44: word, prefix,
    suffix, ±1 words, bias), crc32-hashed (process-stable, unlike Python's
    salted hash) into CRF_D buckets."""
    import zlib

    w = words[i].lower()
    pw = words[i - 1].lower() if i > 0 else "^"
    nw = words[i + 1].lower() if i < len(words) - 1 else "$"
    fs = ("w=" + w, "p3=" + w[:3], "s3=" + w[-3:], "pw=" + pw, "nw=" + nw, "bias")
    return [zlib.crc32(f.encode()) % CRF_D for f in fs]


def _crf_viterbi(esc, tmat):
    """Max-score label path. esc: (n, L) emission scores; tmat: (L+1, L)
    transitions, row L = start. O(n·L²), vectorized over L."""
    import numpy as np

    n, L = esc.shape
    dp = esc[0] + tmat[L]
    bp = np.zeros((n, L), dtype=np.int64)
    for t in range(1, n):
        cand = dp[:, None] + tmat[:L]  # (from, to)
        bp[t] = np.argmax(cand, axis=0)  # ties → lowest label id
        dp = cand[bp[t], np.arange(L)] + esc[t]
    path = np.empty(n, dtype=np.int64)
    path[-1] = int(np.argmax(dp))
    for t in range(n - 1, 0, -1):
        path[t - 1] = bp[t, path[t]]
    return path


def _crf_sentences(pdf):
    """(feats, gold, doc_id, pos) per sentence, in deterministic doc order —
    perceptron updates are order-dependent, so the order must not depend on
    partitioning."""
    import numpy as np

    pdf = pdf.sort_values(["doc_id", "pos"])
    out = []
    for doc, g in pdf.groupby("doc_id", sort=True):
        words = g["word"].tolist()
        feats = np.array([_crf_feats(words, i) for i in range(len(words))])
        out.append((feats, g["label"].to_numpy(), doc, g["pos"].to_numpy()))
    return out


def _crf_train_udf(w_em, w_tr):
    """Per-shard AVERAGED structured perceptron (Collins 2002) from the
    broadcast-in weights; returns one (shard, n_sentences, flat weights)
    row for the driver's per-round weighted average — iterative parameter
    mixing (McDonald et al. 2010), the standard distributed perceptron."""

    def fit(pdf):
        import numpy as np
        import pandas as pd

        W = w_em.copy()
        Tm = w_tr.copy()
        Wa = np.zeros_like(W)
        Ta = np.zeros_like(Tm)
        c = 0
        sents = _crf_sentences(pdf)
        for _ep in range(CRF_EPOCHS):
            for feats, gold, _doc, _pos in sents:
                esc = W[:, feats].sum(axis=2).T  # (n, L)
                pred = _crf_viterbi(esc, Tm)
                if not np.array_equal(pred, gold):
                    for t in range(len(gold)):
                        if pred[t] != gold[t]:
                            W[gold[t], feats[t]] += 1.0
                            W[pred[t], feats[t]] -= 1.0
                    Tm[CRF_L, gold[0]] += 1.0
                    Tm[CRF_L, pred[0]] -= 1.0
                    for t in range(1, len(gold)):
                        Tm[gold[t - 1], gold[t]] += 1.0
                        Tm[pred[t - 1], pred[t]] -= 1.0
                Wa += W
                Ta += Tm
                c += 1
        if c:
            Wa, Ta = Wa / c, Ta / c
        else:  # empty shard: pass the inits through untouched
            Wa, Ta = W, Tm
        flat = np.concatenate([Wa.ravel(), Ta.ravel()])
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0]) if len(pdf) else -1],
                "n": [len(sents)],
                "w": [flat.tolist()],
            }
        )

    return fit


def _crf_decode_udf(w_em, w_tr):
    def dec(pdf):
        import pandas as pd

        rows = {"doc_id": [], "pos": [], "label": [], "pred": []}
        for feats, gold, doc, pos in _crf_sentences(pdf):
            esc = w_em[:, feats].sum(axis=2).T
            pred = _crf_viterbi(esc, w_tr)
            rows["doc_id"].extend([doc] * len(pos))
            rows["pos"].extend(int(p) for p in pos)
            rows["label"].extend(int(v) for v in gold)
            rows["pred"].extend(int(v) for v in pred)
        return pd.DataFrame(rows)

    return dec


def model_zoo_crf_tagger_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRF sequence tagger under O2 sentence-fold CV — the last reference
    model family without a stand-in (r3 VERDICT missing #1).

    Reference: models/tagging/handcrafted_crf_sequence_tagger.py:13-86
    (sklearn_crfsuite lbfgs CRF over the handcrafted window features).
    Spark-first re-expression: the linear-chain structure (emission +
    transition scores, Viterbi decode) is kept exactly, but training is the
    STRUCTURED PERCEPTRON with iterative parameter mixing — shards train
    locally in one ``applyInPandas`` pass per round, the driver averages
    the (L·D + (L+1)·L ≈ 12.3k-float) weight vectors weighted by shard
    size, and re-broadcasts. Collect traffic is CRF_SHARDS tiny weight
    rows per round, never token rows; every token-touching step is an
    Arrow-batched grouped map. Deterministic end to end: crc32 feature
    hashing, h64 fold/shard assignment, doc-sorted update order, uniform
    argmax tie-breaks.

    Labels: the corpus's deterministic BIO rule (runs of words of length
    ≥5), shared with the MaxEnt tagger — so transitions carry real signal
    (I never follows O). Output: Retag-shape flags. Rows-only gate (the
    mixing average is no DuckDB one-liner); semantics gated in pytest
    (held-out accuracy ≫ majority baseline + planted-noise recall)."""
    import numpy as np

    docs = T(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "word")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    fl = F.length("word") >= 5
    did = F.col("doc_id").cast("string")
    base = (
        ex.select("doc_id", "pos", "word", fl.alias("fl"), F.lag(fl).over(w).alias("pfl"))
        .select(
            "doc_id",
            "pos",
            "word",
            F.when(~F.col("fl"), 0)
            .when(F.col("pfl").isNull() | ~F.col("pfl"), 1)
            .otherwise(2)
            .cast("int")
            .alias("label"),
            F.pmod(h64(F.concat(F.lit("tagfold|"), did)), F.lit(K_FOLDS))
            .cast("int")
            .alias("fold"),  # same folds as the MaxEnt tagger: comparable CV
            F.pmod(h64(F.concat(F.lit("crfshard|"), did)), F.lit(CRF_SHARDS))
            .cast("int")
            .alias("shard"),
        )
        .localCheckpoint(eager=True)  # reused by K_FOLDS × (ROUNDS + 1) passes
    )
    parts = []
    for f in range(K_FOLDS):
        train = base.where(F.col("fold") != f)
        w_em = np.zeros((CRF_L, CRF_D))
        w_tr = np.zeros((CRF_L + 1, CRF_L))
        for _r in range(CRF_ROUNDS):
            rows = (
                train.groupBy("shard")
                .applyInPandas(_crf_train_udf(w_em, w_tr), "shard int, n long, w array<double>")
                .collect()
            )
            tot = sum(r["n"] for r in rows) or 1
            flat = sum(np.asarray(r["w"]) * r["n"] for r in rows) / tot
            w_em = flat[: CRF_L * CRF_D].reshape(CRF_L, CRF_D)
            w_tr = flat[CRF_L * CRF_D:].reshape(CRF_L + 1, CRF_L)
        pred = (
            base.where(F.col("fold") == f)
            .groupBy("shard")
            .applyInPandas(
                _crf_decode_udf(w_em, w_tr), "doc_id long, pos int, label int, pred int"
            )
            .withColumn("fold", F.lit(f))
        )
        parts.append(pred)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "doc_id", "pos", "fold",
        F.col("label").alias("noisy"), "pred",
        (F.col("pred") != F.col("label")).alias("flag"),
    ).orderBy("doc_id", "pos")


def model_zoo_mlp_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neural zoo slot (flair/transformer classifier role →
    MultilayerPerceptronClassifier, distributed L-BFGS). Single seeded
    even/odd split instead of the K-fold loop to bound fit count; float
    weights are not bit-stable across engines → rows-only gate, semantics
    gated in pytest (holdout accuracy beats the prior baseline)."""
    from nessie_spark.models.zoo import MLPClassifier

    df = _emb_features(spark, sf_dir)
    m = MLPClassifier(N_CLASSES).fit(df.where(F.col("vec_id") % 2 == 0))
    return (
        m.predict_proba(df.where(F.col("vec_id") % 2 == 1))
        .select("vec_id", "pred", (F.col("pred") != F.col("label")).alias("flag"))
        .orderBy("vec_id")
    )


def model_zoo_gbt_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boosted-trees zoo slot (lightgbm/xgboost role → one-vs-rest
    GBTClassifier; C sequential distributed boosting fits). Same single
    even/odd split and rows-only gate as the MLP slot."""
    from nessie_spark.models.zoo import GBTOneVsRest

    df = _emb_features(spark, sf_dir)
    m = GBTOneVsRest(N_CLASSES).fit(df.where(F.col("vec_id") % 2 == 0))
    return (
        m.predict_proba(df.where(F.col("vec_id") % 2 == 1))
        .select("vec_id", "pred", (F.col("pred") != F.col("label")).alias("flag"))
        .orderBy("vec_id")
    )


QUERIES: dict[str, tuple] = {
    "model_zoo_dummy_cv": (model_zoo_dummy_cv, MODEL_ZOO_DUMMY_CV_SQL),
    "model_zoo_maxent_cv_flags": (model_zoo_maxent_cv_flags, None),
    "model_zoo_bow_nb_cv_flags": (model_zoo_bow_nb_cv_flags, None),
    "model_zoo_repeated_probas": (model_zoo_repeated_probas, None),
    "irt_2pl_discrimination_flags": (irt_2pl_discrimination_flags, None),
    "curriculum_spotter_model_scores": (curriculum_spotter_model_scores, None),
    "leitner_spotter_model_scores": (leitner_spotter_model_scores, None),
    "model_zoo_token_tagger_cv": (model_zoo_token_tagger_cv, None),
    "model_zoo_crf_tagger_cv": (model_zoo_crf_tagger_cv, None),
    "model_zoo_mlp_flags": (model_zoo_mlp_flags, None),
    "model_zoo_gbt_flags": (model_zoo_gbt_flags, None),
    "model_zoo_fasttext_cv_flags": (model_zoo_fasttext_cv_flags, None),
}

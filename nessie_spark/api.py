"""Reference-shaped detector API — the migration facade.

The reference exposes ~20 detector classes with a uniform
``score()``/``correct()`` interface over parallel NumPy arrays
(/root/reference/nessie/detectors/__init__.py). This module re-exposes the
same class names over DataFrames so a reference user can switch engines by
swapping the import: arrays become columns, the positional alignment
contract becomes an id column, and every transform is a pure Catalyst
expression plan (lazy, whole-stage-codegen'd, shuffle-aware) instead of an
eager in-core pass.

Conventions (SURVEY.md §1.1 "flags/scores are columns, never positional"):
- constructors take **column names** (defaults match the reference's
  vocabulary: ``text``/``label``/``probabilities``/...);
- flaggers append a boolean ``flag`` column, scorers a double ``score``
  column (the reference's DetectorKind split, error_detector.py:44-105);
- ``correct()`` appends a ``corrected`` column where supported;
- inputs/outputs are DataFrames — nothing is collected, so every detector
  composes with the lakehouse scan and runs at 10^12-row scale;
- every row of the input survives score()/correct(): a row whose per-row
  input is empty/NULL (an empty ensemble array, a kNN instance with no LSH
  candidates) keeps a NULL in the appended column instead of being dropped.

Semantics are pinned two ways: each class cites its reference file, and
``tests/test_api_facade.py`` asserts bit-equality against the oracle-green
query-registry implementations on the shared fixtures (transitively, the
DuckDB oracles verify this module too).

Model-loop detectors stay as query-level entry points (their training
dynamics are inseparable from the epoch loop + zoo model wiring):
CurriculumSpotter / LeitnerSpotter →
``operators.modelzoo.{curriculum,leitner}_spotter_model_scores``,
VariationNGramsSpan → ``operators.detectors3.variation_ngrams_span``,
the 2PL IRT fit → ``operators.modelzoo.irt_2pl_discrimination_flags``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nessie_spark.functions.core import entropy_ln, prob_margin

__all__ = [
    "Detector",
    "Retag",
    "MajorityLabelBaseline",
    "MajorityLabelPerSurfaceFormBaseline",
    "MajorityVotingEnsemble",
    "LabelEntropy",
    "WeightedDiscrepancy",
    "ClassificationEntropy",
    "ClassificationUncertainty",
    "PredictionMargin",
    "DropoutUncertainty",
    "DataMapConfidence",
    "BordaCount",
    "MeanDistance",
    "KnnFlagger",
    "KnnEntropy",
    "ConfidentLearning",
    "LabelAggregation",
    "ItemResponseTheoryFlagger",
    "VariationNGrams",
    "MaxEntProjectionEnsemble",
    "CrossValidationHelper",
    "percentage_flagged",
]


class Detector:
    """Base contract (error_detector.py:44-105): ``kind`` is 'flagger' or
    'scorer'; ``score(df)`` returns ``df`` + ``flag``/``score`` column."""

    kind: str = "scorer"

    def score(self, df: DataFrame) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    def supports_correction(self) -> bool:
        return hasattr(type(self), "correct")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _surface(col: str, lowercase: bool) -> Column:
    return F.lower(_c(col)) if lowercase else _c(col)


def _label_idx(label_col: str, classes: list[str] | None) -> Column:
    """Label → probability-vector index. With ``classes`` the label is
    looked up in the literal dictionary and an UNSEEN label raises (the
    reference's LabelEncoder contract) instead of silently indexing -1;
    without it the label column must already be the integer index."""
    if classes is None:
        return _c(label_col).cast("int")
    pos = F.array_position(F.array(*[F.lit(c) for c in classes]), _c(label_col))
    return (
        # NULL label → NULL index (the module's NULL-row-survives rule:
        # the row keeps a NULL score instead of crashing the job); a
        # non-NULL label OUTSIDE the dictionary still raises
        F.when(_c(label_col).isNull(), F.lit(None))
        .when(pos > 0, pos - 1)
        .otherwise(
            F.raise_error(F.concat(F.lit("label not in classes: "), _c(label_col)))
        )
        .cast("int")
    )


class Retag(Detector):
    """Flag label ≠ model prediction (retag.py:18-34); ``correct`` = the
    prediction (retag.py:39-40)."""

    kind = "flagger"

    def __init__(self, label_col: str = "label", pred_col: str = "prediction"):
        self.label_col, self.pred_col = label_col, pred_col

    def score(self, df: DataFrame) -> DataFrame:
        return df.withColumn("flag", _c(self.label_col) != _c(self.pred_col))

    def correct(self, df: DataFrame) -> DataFrame:
        return df.withColumn("corrected", _c(self.pred_col))


class MajorityLabelBaseline(Detector):
    """Flag every instance whose label ≠ the global modal label
    (baselines.py:11-46; ties → lexicographically smallest, scipy ``mode``
    semantics). One tiny aggregate broadcast back — no per-row state."""

    kind = "flagger"

    def __init__(self, text_col: str = "text", label_col: str = "label"):
        self.text_col, self.label_col = text_col, label_col

    def _mode(self, df: DataFrame) -> DataFrame:
        return (
            df.groupBy(self.label_col)
            .count()
            .orderBy(F.desc("count"), F.asc(self.label_col))
            .limit(1)
            .select(_c(self.label_col).alias("_mode"))
        )

    def score(self, df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(self._mode(df)))
            .withColumn("flag", _c(self.label_col) != F.col("_mode"))
            .drop("_mode")
        )

    def correct(self, df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(self._mode(df)))
            .withColumn("corrected", F.col("_mode"))
            .drop("_mode")
        )


class MajorityLabelPerSurfaceFormBaseline(Detector):
    """Per-surface-form modal label; flag minority members
    (baselines.py:49-96). The modal frame is |surfaces|-sized → broadcast
    join-back (the J5 pattern); no window over the full table."""

    kind = "flagger"

    def __init__(self, text_col: str = "text", label_col: str = "label", lowercase: bool = True):
        self.text_col, self.label_col, self.lowercase = text_col, label_col, lowercase

    def _modal(self, df: DataFrame) -> DataFrame:
        # delegates to the ONE modal-label rule (desc count, asc label)
        # shared with the surface scorers — a tie-rule fix lands once
        sf = _surface(self.text_col, self.lowercase)
        counts = df.groupBy(sf.alias("_sf"), _c(self.label_col).alias("_lb")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        return _SurfaceScorer._modal_of(counts)

    def _joined(self, df: DataFrame) -> DataFrame:
        sf = _surface(self.text_col, self.lowercase)
        return df.withColumn("_sf", sf).join(F.broadcast(self._modal(df)), "_sf", "left")

    def score(self, df: DataFrame) -> DataFrame:
        return (
            self._joined(df)
            .withColumn("flag", _c(self.label_col) != F.col("_modal"))
            .drop("_sf", "_modal")
        )

    def correct(self, df: DataFrame) -> DataFrame:
        return (
            self._joined(df)
            .withColumn("corrected", F.col("_modal"))
            .drop("_sf", "_modal")
        )


class MajorityVotingEnsemble(Detector):
    """Flag label ≠ majority vote of an ensemble (ensemble.py:9-43). The
    reference's (num_models, N) array arrives as an ``array<string>``
    predictions column (the row-wise transpose); ties break to the
    smallest label (scipy ``mode``). Vote = in-row expression over the
    exploded counts — one groupBy on (id, prediction), no cross-model
    shuffle."""

    kind = "flagger"

    def __init__(
        self,
        id_col: str = "instance_id",
        label_col: str = "label",
        preds_col: str = "ensemble_predictions",
    ):
        self.id_col, self.label_col, self.preds_col = id_col, label_col, preds_col

    def _vote(self, df: DataFrame) -> DataFrame:
        ex = df.select(self.id_col, F.explode(self.preds_col).alias("_p"))
        counts = ex.groupBy(self.id_col, "_p").count()
        w = Window.partitionBy(self.id_col).orderBy(F.desc("count"), F.asc("_p"))
        return (
            counts.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(self.id_col, F.col("_p").alias("_vote"))
        )

    def score(self, df: DataFrame) -> DataFrame:
        return (
            df.join(self._vote(df), self.id_col, "left")
            .withColumn("flag", _c(self.label_col) != F.col("_vote"))
            .drop("_vote")
        )

    def correct(self, df: DataFrame) -> DataFrame:
        return (
            df.join(self._vote(df), self.id_col, "left")
            .withColumn("corrected", F.col("_vote"))
            .drop("_vote")
        )


class _SurfaceScorer(Detector):
    def __init__(self, text_col: str = "text", label_col: str = "label", lowercase: bool = True):
        self.text_col, self.label_col, self.lowercase = text_col, label_col, lowercase

    def _counts(self, df: DataFrame) -> DataFrame:
        sf = _surface(self.text_col, self.lowercase)
        return df.groupBy(sf.alias("_sf"), _c(self.label_col).alias("_lb")).agg(
            F.count(F.lit(1)).alias("_cnt")
        )

    @staticmethod
    def _modal_of(counts: DataFrame) -> DataFrame:
        w = Window.partitionBy("_sf").orderBy(F.desc("_cnt"), F.asc("_lb"))
        return (
            counts.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("_sf", F.col("_lb").alias("_modal"))
        )

    def _rescaled(self, raw: DataFrame, invert: bool) -> DataFrame:
        mm = raw.agg(F.min("_raw").alias("_mn"), F.max("_raw").alias("_mx"))
        scaled = F.when(
            F.col("_mx") > F.col("_mn"),
            (F.col("_raw") - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
        ).otherwise(F.lit(0.0))
        out = raw.crossJoin(F.broadcast(mm)).withColumn(
            "score", (1 - scaled) if invert else scaled
        )
        return out.drop("_raw", "_mn", "_mx", "_sf", "_modal")


class LabelEntropy(_SurfaceScorer):
    """Per-surface label-distribution entropy, base 2; the surface's modal
    label scores 0; final score = 1 − minmax-rescale (label_entropy.py:21-67).
    Two-level aggregation + broadcast join-back instead of the reference's
    per-surface Python loop."""

    def score(self, df: DataFrame) -> DataFrame:
        counts = self._counts(df)
        tot = counts.groupBy("_sf").agg(F.sum("_cnt").alias("_tot"))
        ent = (
            counts.join(tot, "_sf")
            .groupBy("_sf")
            .agg(
                (-F.sum((F.col("_cnt") / F.col("_tot")) * F.log2(F.col("_cnt") / F.col("_tot"))))
                .alias("_ent")
            )
        )
        raw = (
            df.withColumn("_sf", _surface(self.text_col, self.lowercase))
            .join(F.broadcast(ent), "_sf", "left")
            .join(F.broadcast(self._modal_of(counts)), "_sf", "left")
            .withColumn(
                "_raw",
                F.when(_c(self.label_col) == F.col("_modal"), F.lit(0.0)).otherwise(
                    F.col("_ent")
                ),
            )
            .drop("_ent")
        )
        return self._rescaled(raw, invert=True)


class WeightedDiscrepancy(_SurfaceScorer):
    """(cmax − cmin) / n_labels × n_s for minority members, 0 for modal
    ones, minmax-rescaled (weighted_discrepancy.py:11-56)."""

    def score(self, df: DataFrame) -> DataFrame:
        counts = self._counts(df)
        stats = counts.groupBy("_sf").agg(
            F.max("_cnt").alias("_cmax"),
            F.min("_cnt").alias("_cmin"),
            F.sum("_cnt").alias("_ns"),
            F.count(F.lit(1)).alias("_nl"),
        )
        raw = (
            df.withColumn("_sf", _surface(self.text_col, self.lowercase))
            .join(F.broadcast(stats), "_sf", "left")
            .join(F.broadcast(self._modal_of(counts)), "_sf", "left")
            .withColumn(
                "_raw",
                F.when(
                    _c(self.label_col) != F.col("_modal"),
                    (F.col("_cmax") - F.col("_cmin"))
                    / F.col("_nl").cast("double")
                    * F.col("_ns"),
                ).otherwise(F.lit(0.0)),
            )
            .drop("_cmax", "_cmin", "_ns", "_nl")
        )
        return self._rescaled(raw, invert=False)


class ClassificationEntropy(Detector):
    """H(p) per instance, natural log (classification_entropy.py:20-31).
    Pure in-row fold — a map over the scan, zero shuffle."""

    def __init__(self, probs_col: str = "probabilities"):
        self.probs_col = probs_col

    def score(self, df: DataFrame) -> DataFrame:
        return df.withColumn("score", entropy_ln(_c(self.probs_col)))


class ClassificationUncertainty(Detector):
    """1 − p[noisy label] (classification_uncertainty.py:25-42). The
    reference's LabelEncoder arrives as either an int index column or a
    ``classes`` list (the label dictionary, broadcast as a literal
    array)."""

    def __init__(
        self,
        probs_col: str = "probabilities",
        label_col: str = "label",
        classes: list[str] | None = None,
    ):
        self.probs_col, self.label_col, self.classes = probs_col, label_col, classes

    def score(self, df: DataFrame) -> DataFrame:
        idx = _label_idx(self.label_col, self.classes)
        return df.withColumn("score", 1 - F.get(_c(self.probs_col), idx))


class PredictionMargin(Detector):
    """1 − (p_max − p_2nd) (prediction_margin.py:16-39)."""

    def __init__(self, probs_col: str = "probabilities"):
        self.probs_col = probs_col

    def score(self, df: DataFrame) -> DataFrame:
        return df.withColumn("score", prob_margin(_c(self.probs_col)))


class DropoutUncertainty(Detector):
    """Entropy of the mean of T repeated distributions
    (dropout_uncertainty.py:28-51 entropy formulation, :79-91). Input: an
    ``array<array<double>>`` column, shape (T, C) per row — in-row folds
    only."""

    def __init__(self, repeated_probs_col: str = "repeated_probabilities"):
        self.repeated_probs_col = repeated_probs_col

    def score(self, df: DataFrame) -> DataFrame:
        rep = _c(self.repeated_probs_col)
        zeros = F.transform(F.get(rep, 0), lambda _: F.lit(0.0))
        sums = F.aggregate(rep, zeros, lambda acc, p: F.zip_with(acc, p, lambda a, b: a + b))
        mean = F.transform(sums, lambda v: v / F.size(rep))
        return df.withColumn("score", entropy_ln(mean))


class DataMapConfidence(Detector):
    """1 − mean over training epochs of p(label) (datamap_confidence.py:
    25-70; per-epoch snapshots arrive as an ``array<array<double>>``
    column instead of a TrainerCallback)."""

    def __init__(self, epoch_probs_col: str = "epoch_probabilities", label_idx_col: str = "label"):
        self.epoch_probs_col, self.label_idx_col = epoch_probs_col, label_idx_col

    def score(self, df: DataFrame) -> DataFrame:
        eps = _c(self.epoch_probs_col)
        idx = _c(self.label_idx_col).cast("int")
        conf = F.aggregate(
            eps, F.lit(0.0), lambda acc, p: acc + F.get(p, idx)
        ) / F.size(eps)
        return df.withColumn("score", 1 - conf)


class BordaCount(Detector):
    """Ordinal rank per scorer across the dataset, summed per instance
    (borda_count.py:21-37). Input: an ``array<double>`` ensemble-scores
    column (S scorers per row); ranks are S windows partitioned by scorer
    index — ties break by id for determinism (the reference's 'ordinal'
    method breaks ties by array position)."""

    kind = "scorer"

    def __init__(self, id_col: str = "instance_id", scores_col: str = "ensemble_scores"):
        self.id_col, self.scores_col = id_col, scores_col

    def score(self, df: DataFrame) -> DataFrame:
        ex = df.select(
            self.id_col, F.posexplode(_c(self.scores_col)).alias("_scorer", "_s")
        )
        w = Window.partitionBy("_scorer").orderBy(F.asc("_s"), F.asc(self.id_col))
        borda = (
            ex.withColumn("_rk", F.row_number().over(w))
            .groupBy(self.id_col)
            .agg(F.sum("_rk").alias("score"))
        )
        return df.join(borda, self.id_col, "left")


class MeanDistance(Detector):
    """Distance of each instance to its class centroid
    (mean_distance.py:12-103; metrics 'euclidean' | 'cosine' | 'dot').
    Centroids: posexplode → (label, pos) avg (map-side combined) →
    re-assembled arrays, an always-broadcastable |labels|-row frame; the
    distance is one ordered in-row fold — no N-row re-aggregation."""

    METRICS = ("euclidean", "cosine", "dot")

    def __init__(
        self,
        label_col: str = "label",
        emb_col: str = "embedded_instances",
        metric: str = "euclidean",
    ):
        if metric not in self.METRICS:
            raise ValueError(f"metric must be one of {self.METRICS}")
        self.label_col, self.emb_col, self.metric = label_col, emb_col, metric

    def _centroids(self, df: DataFrame) -> DataFrame:
        ex = df.select(
            _c(self.label_col).alias("_lb"),
            F.posexplode(F.transform(_c(self.emb_col), lambda v: v.cast("double"))).alias(
                "_pos", "_val"
            ),
        )
        cent = ex.groupBy("_lb", "_pos").agg(F.avg("_val").alias("_cv"))
        return (
            cent.groupBy("_lb")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_cv"))).alias("_ps"))
            .select("_lb", F.transform("_ps", lambda s: s["_cv"]).alias("_cvec"))
        )

    def score(self, df: DataFrame) -> DataFrame:
        e = F.transform(_c(self.emb_col), lambda v: v.cast("double"))
        joined = df.withColumn("_e", e).join(
            F.broadcast(self._centroids(df)),
            _c(self.label_col) == F.col("_lb"),
            "left",
        )
        ec, cv = F.col("_e"), F.col("_cvec")
        if self.metric == "euclidean":
            d2 = F.aggregate(
                F.zip_with(ec, cv, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            dist = F.sqrt(d2)
        elif self.metric == "cosine":
            from nessie_spark.functions.core import cosine_sim

            dist = F.lit(1.0) - cosine_sim(ec, cv)
        else:  # dot
            dist = -F.aggregate(
                F.zip_with(ec, cv, lambda x, c: x * c), F.lit(0.0), lambda a, v: a + v
            )
        return joined.withColumn("score", dist).drop("_e", "_cvec", "_lb")


class _KnnErrorDetector(Detector):
    """Shared kNN machinery (knn_entropy.py:16-80; faiss IndexFlatL2 →
    the engine's LSH-bucketed candidate join, operators/probability.
    knn_pairs_from — banded sign-LSH, id-only candidate pairs through the
    shuffle, exact L2 on candidates only; no CartesianProduct at any N)."""

    def __init__(
        self,
        id_col: str = "instance_id",
        label_col: str = "label",
        emb_col: str = "embedded_instances",
        k: int = 10,
    ):
        self.id_col, self.label_col, self.emb_col, self.k = id_col, label_col, emb_col, k

    def _pairs(self, df: DataFrame) -> DataFrame:
        from nessie_spark.operators.probability import knn_pairs_from

        emb = df.select(
            _c(self.id_col).alias("vec_id"),
            _c(self.label_col).alias("label"),
            F.transform(_c(self.emb_col), lambda v: v.cast("double")).alias("e"),
        )
        return knn_pairs_from(emb, self.k)


class KnnFlagger(_KnnErrorDetector):
    """Flag own label ≠ modal label among the k nearest neighbors
    (knn_entropy.py:90-96); ties → smallest label."""

    kind = "flagger"

    def score(self, df: DataFrame) -> DataFrame:
        nn = self._pairs(df)
        counts = nn.groupBy("qid", "nlabel").agg(F.count(F.lit(1)).alias("_cnt"))
        w = Window.partitionBy("qid").orderBy(F.desc("_cnt"), F.asc("nlabel"))
        modal = (
            counts.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("qid").alias(self.id_col), F.col("nlabel").alias("_knn"))
        )
        return (
            df.join(modal, self.id_col, "left")
            .withColumn("flag", _c(self.label_col) != F.col("_knn"))
            .drop("_knn")
        )


class KnnEntropy(_KnnErrorDetector):
    """Entropy of the neighbor-label distribution among the k nearest
    (knn_entropy.py:82-88); count-based p = c/k."""

    def score(self, df: DataFrame) -> DataFrame:
        nn = self._pairs(df)
        counts = nn.groupBy("qid", "nlabel").agg(F.count(F.lit(1)).alias("_cnt"))
        ent = (
            counts.groupBy("qid")
            .agg(
                (-F.sum(
                    (F.col("_cnt") / float(self.k)) * F.log(F.col("_cnt") / float(self.k))
                )).alias("score")
            )
            .select(F.col("qid").alias(self.id_col), "score")
        )
        return df.join(ent, self.id_col, "left")


class ConfidentLearning(Detector):
    """cleanlab-style flag (confident_learning.py:22-60): per-class
    threshold = mean self-confidence of instances carrying the class; flag
    instances whose p(own class) falls below their class threshold. One
    aggregate + broadcast join-back."""

    kind = "flagger"

    def __init__(
        self,
        probs_col: str = "probabilities",
        label_col: str = "label",
        classes: list[str] | None = None,
    ):
        self.probs_col, self.label_col, self.classes = probs_col, label_col, classes

    def score(self, df: DataFrame) -> DataFrame:
        idx = _label_idx(self.label_col, self.classes)
        d = df.withColumn("_sc", F.get(_c(self.probs_col), idx))
        thr = d.groupBy(_c(self.label_col).alias("_lb")).agg(
            F.avg("_sc").alias("_thr")
        )
        return (
            d.join(F.broadcast(thr), _c(self.label_col) == F.col("_lb"), "left")
            .withColumn("flag", F.col("_sc") < F.col("_thr"))
            .drop("_sc", "_thr", "_lb")
        )


class LabelAggregation(Detector):
    """Dawid–Skene adjudication over worker votes (label_aggregation.py:
    22-80; hard-EM variant, integer-exact m-steps — the soft-EM twin lives
    in operators/detectors3.dawid_skene_soft_labels). Votes arrive as a
    fixed-width ``array<int>`` column (one slot per worker). The EM runs
    on the VOTE-PATTERN HISTOGRAM — the sufficient statistic, ≤ C^W rows
    collected to the driver (metadata-scale regardless of task count) —
    and one broadcast join maps adjudications back."""

    kind = "flagger"

    def __init__(
        self,
        id_col: str = "instance_id",
        label_col: str = "label",
        votes_col: str = "ensemble_predictions",
        n_classes: int = 4,
        iters: int = 5,
    ):
        self.id_col, self.label_col, self.votes_col = id_col, label_col, votes_col
        self.n_classes, self.iters = n_classes, iters

    def _adjudicate(self, df: DataFrame) -> DataFrame:
        import numpy as np

        # deterministic in the histogram → memoize per input so the common
        # score()-then-correct() flow collects and iterates EM once
        if getattr(self, "_cache", None) is not None and self._cache[0] is df:
            return self._cache[1]

        # NULL / ragged vote arrays cannot be adjudicated: exclude them
        # from the histogram (their rows keep NULL outputs via the
        # left-join-back, per the module's NULL convention)
        w_expected = F.size(_c(self.votes_col))
        # tie-break on the smaller width: desc(count) alone is
        # nondeterministic across partitionings when two widths share the
        # modal row count (r3 ADVICE)
        mode_w = (
            df.where(_c(self.votes_col).isNotNull())
            .groupBy(w_expected.alias("_w")).count()
            .orderBy(F.desc("count"), F.asc("_w")).limit(1)
        ).collect()
        hist = (
            df.where(
                _c(self.votes_col).isNotNull()
                & (F.size(_c(self.votes_col)) == int(mode_w[0]["_w"]))
            )
            .groupBy(_c(self.votes_col).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_m"))
            .orderBy("_v")
            .collect()
        ) if mode_w else []
        spark = df.sparkSession
        if not hist:
            model = spark.createDataFrame([], "_v array<int>, _z int")
            self._cache = (df, model)
            return model
        pat = np.array([r["_v"] for r in hist], dtype=np.int64)
        m = np.array([r["_m"] for r in hist], dtype=np.int64)
        P, W = pat.shape
        C = self.n_classes
        n_tasks = int(m.sum())
        cnt = np.zeros((P, C), dtype=np.int64)
        for c in range(C):
            cnt[:, c] = (pat == c).sum(axis=1)
        z = np.argmax(cnt, axis=1)  # majority init, ties -> smallest class
        for _ in range(self.iters):
            pc = np.array([m[z == c].sum() for c in range(C)], dtype=np.int64)
            theta = np.empty((W, C, C), dtype=np.float64)
            for w in range(W):
                for c in range(C):
                    tw = np.array(
                        [m[(z == c) & (pat[:, w] == k)].sum() for k in range(C)],
                        dtype=np.int64,
                    )
                    theta[w, c] = (tw + 1).astype(np.float64) / float(pc[c] + C)
            pi = (pc + 1).astype(np.float64) / float(n_tasks + C)
            s = np.tile(pi, (P, 1))
            for w in range(W):
                s = s * theta[w][:, pat[:, w]].T
            z = np.argmax(s, axis=1)
        model = spark.createDataFrame(
            [([int(x) for x in p], int(zz)) for p, zz in zip(pat, z)],
            "_v array<int>, _z int",
        )
        self._cache = (df, model)
        return model

    def score(self, df: DataFrame) -> DataFrame:
        model = self._adjudicate(df)
        return (
            df.join(F.broadcast(model), _c(self.votes_col) == F.col("_v"), "left")
            .withColumn("flag", _c(self.label_col).cast("int") != F.col("_z"))
            .drop("_v", "_z")
        )

    def correct(self, df: DataFrame) -> DataFrame:
        model = self._adjudicate(df)
        return (
            df.join(F.broadcast(model), _c(self.votes_col) == F.col("_v"), "left")
            .withColumn("corrected", F.col("_z"))
            .drop("_v", "_z")
        )


class ItemResponseTheoryFlagger(Detector):
    """Item-discrimination flag (irt.py:17-123 role; the engine ships the
    classical point-biserial discrimination index — corr across models
    between item correctness and model ability — as the integer-exact
    variant; the full 2PL alternating-gradient fit lives in
    operators/modelzoo.irt_2pl_discrimination_flags). Flag disc < 0."""

    kind = "flagger"

    def __init__(
        self,
        id_col: str = "instance_id",
        label_col: str = "label",
        preds_col: str = "ensemble_predictions",
    ):
        self.id_col, self.label_col, self.preds_col = id_col, label_col, preds_col

    def score(self, df: DataFrame) -> DataFrame:
        ex = df.select(
            _c(self.id_col).alias("_id"),
            F.posexplode(_c(self.preds_col)).alias("_w", "_p"),
            _c(self.label_col).alias("_lb"),
        ).withColumn("_corr", (F.col("_p") == F.col("_lb")).cast("int"))
        ability = ex.groupBy("_w").agg(F.avg("_corr").alias("_a"))
        j = ex.join(F.broadcast(ability), "_w")
        stats = j.groupBy("_id").agg(
            F.avg("_corr").alias("_mc"),
            F.avg("_a").alias("_ma"),
            F.sum(F.col("_corr") * F.col("_a")).alias("_sca"),
            F.sum(F.col("_corr") * F.col("_corr")).alias("_scc"),
            F.sum(F.col("_a") * F.col("_a")).alias("_saa"),
            F.count(F.lit(1)).alias("_n"),
        )
        cov = F.col("_sca") - F.col("_n") * F.col("_mc") * F.col("_ma")
        varc = F.col("_scc") - F.col("_n") * F.col("_mc") * F.col("_mc")
        vara = F.col("_saa") - F.col("_n") * F.col("_ma") * F.col("_ma")
        disc = F.when(varc * vara <= 0, F.lit(0.0)).otherwise(cov / F.sqrt(varc * vara))
        out = stats.select(
            F.col("_id").alias(self.id_col),
            disc.alias("disc"),
            (disc < 0).alias("flag"),
        )
        return df.join(out, self.id_col, "left")


class CrossValidationHelper:
    """The reference's CV orchestration (helper.py:138-256): out-of-fold
    ``predict_proba`` for every instance. ``run(df, model)`` takes any zoo
    model (nessie_spark.models.zoo) and returns the input plus ``fold``,
    ``probs`` (array<double>) and ``pred`` columns — the Result analog as
    columns, never positional."""

    def __init__(self, n_splits: int = 10, id_col: str = "instance_id"):
        self.n_splits, self.id_col = n_splits, id_col

    def run(self, df: DataFrame, model) -> DataFrame:
        from nessie_spark.models.cv import cross_val_predict

        return cross_val_predict(df, model, self.id_col, self.n_splits)


class VariationNGrams(Detector):
    """Sequence-labeling variation n-grams (variational_principle.py:16-143,
    Dickinson & Meurers 2003): repeated token sequences across the corpus
    that carry different tag sequences get their minority occurrences
    flagged, position by position. The suffix tree's maximal repeats are
    re-expressed as bounded-n occurrence enumeration + neighbor-diversity
    aggregation (Gusfield's left/right-diverse criterion), the same
    Spark-native rewrite as the oracle-green ``variation_ngrams_multi``
    query: one Arrow-batched enumeration pass, one groupBy on the gram key,
    broadcast vote join — no pointer structures, no driver state.

    ``score`` appends a ``flags: array<boolean>`` column aligned with the
    tokens (the reference's ragged bool array); ``correct`` appends
    ``corrected: array<string>``. On conflicting corrections for one token
    the longest repeat (then smallest gram) wins — a deterministic stand-in
    for the reference's suffix-tree-order overwrites (:81, sort order of an
    internal tree walk, not a documented semantic)."""

    kind = "flagger"
    _SEP = "\x1f"

    def __init__(
        self,
        id_col: str = "instance_id",
        tokens_col: str = "sentences",
        tags_col: str = "tags",
        n_max: int = 4,
        lowercase: bool = True,
    ):
        self.id_col, self.tokens_col, self.tags_col = id_col, tokens_col, tags_col
        self.n_max, self.lowercase = n_max, lowercase

    def _occ(self, df: DataFrame) -> DataFrame:
        n_max, lower, sep = self.n_max, self.lowercase, self._SEP
        # the id passes through the Arrow boundary with its OWN type —
        # hard-coding long here crashed on string ids mid-job
        id_dt = df.schema[self.id_col].dataType.simpleString()
        src = df.select(
            _c(self.id_col).alias("_id"),
            _c(self.tokens_col).alias("_toks"),
            _c(self.tags_col).alias("_tags"),
        )

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                cols = {k: [] for k in ("_id", "n", "pos", "gram", "tagseq", "prev", "nxt")}
                for i, ts, gs in zip(pdf["_id"], pdf["_toks"], pdf["_tags"]):
                    ts = [t.lower() for t in ts] if lower else list(ts)
                    gs = list(gs)
                    ln = len(ts)
                    grams = ts
                    tseqs = gs
                    for n in range(2, n_max + 1):
                        if ln < n:
                            break
                        grams = [grams[j] + " " + ts[j + n - 1] for j in range(ln - n + 1)]
                        tseqs = [tseqs[j] + sep + gs[j + n - 1] for j in range(ln - n + 1)]
                        cols["_id"].extend([i] * (ln - n + 1))
                        cols["n"].extend([n] * (ln - n + 1))
                        cols["pos"].extend(range(ln - n + 1))
                        cols["gram"].extend(grams)
                        cols["tagseq"].extend(tseqs)
                        cols["prev"].extend([None] + ts[: ln - n])
                        cols["nxt"].extend(ts[n:] + [None])
                yield pd.DataFrame(cols)

        return src.mapInPandas(
            gen,
            schema=f"_id {id_dt}, n int, pos int, gram string, tagseq string, "
            "prev string, nxt string",
        )

    def _flagged(self, df: DataFrame) -> DataFrame:
        """(id, tokpos, n, gram, modal_tag) for every position whose tag
        disagrees with its repeat's majority tag sequence."""
        occ = self._occ(df).localCheckpoint(eager=True)
        grp = occ.groupBy("n", "gram").agg(
            F.count(F.lit(1)).alias("_nocc"),
            F.countDistinct("tagseq").alias("_nseq"),
            F.countDistinct("prev").alias("_dp"),
            F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0)).alias("_bp"),
            F.countDistinct("nxt").alias("_dn"),
            F.sum(F.when(F.col("nxt").isNull(), 1).otherwise(0)).alias("_bn"),
        )
        keep = grp.where(
            (F.col("_nocc") >= 2)
            & (F.col("_nseq") >= 2)
            & (
                (F.col("n") == self.n_max)
                | (
                    ((F.col("_bp") > 0) | (F.col("_dp") > 1))
                    & ((F.col("_bn") > 0) | (F.col("_dn") > 1))
                )
            )
        ).select("n", "gram")
        counts = occ.groupBy("n", "gram", "tagseq").agg(F.count(F.lit(1)).alias("_cnt"))
        mw = Window.partitionBy("n", "gram").orderBy(F.desc("_cnt"), F.asc("tagseq"))
        modal = (
            counts.withColumn("_rk", F.row_number().over(mw))
            .where(F.col("_rk") == 1)
            .select("n", "gram", F.col("tagseq").alias("_mseq"))
        )
        dim = F.broadcast(keep.join(modal, ["n", "gram"]))
        hit = occ.join(dim, ["n", "gram"]).where(F.col("tagseq") != F.col("_mseq"))
        own = F.split("tagseq", self._SEP)
        mod = F.split("_mseq", self._SEP)
        offs = F.filter(
            F.sequence(F.lit(0), F.col("n") - 1),
            lambda k: F.get(own, k) != F.get(mod, k),
        )
        return hit.select(
            "_id", "n", "gram", "pos", mod.alias("_marr"), F.explode(offs).alias("_k")
        ).select(
            "_id",
            (F.col("pos") + F.col("_k")).alias("tokpos"),
            "n",
            "gram",
            F.get("_marr", F.col("_k")).alias("modal_tag"),
        )

    def score(self, df: DataFrame) -> DataFrame:
        fp = self._flagged(df).groupBy("_id").agg(
            F.collect_set("tokpos").alias("_fpos")
        )
        out = df.join(fp, _c(self.id_col) == F.col("_id"), "left").drop("_id")
        flags = F.transform(
            _c(self.tags_col),
            lambda _, i: F.when(F.col("_fpos").isNull(), F.lit(False)).otherwise(
                F.array_contains("_fpos", i)
            ),
        )
        return out.withColumn("flags", flags).drop("_fpos")

    def correct(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy("_id", "tokpos").orderBy(F.desc("n"), F.asc("gram"))
        best = (
            self._flagged(df)
            .withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .groupBy("_id")
            .agg(F.map_from_arrays(
                F.collect_list("tokpos"), F.collect_list("modal_tag")
            ).alias("_fix"))
        )
        out = df.join(best, _c(self.id_col) == F.col("_id"), "left").drop("_id")
        corrected = F.transform(
            _c(self.tags_col),
            lambda t, i: F.when(F.col("_fix").isNull(), t).otherwise(
                F.coalesce(F.try_element_at("_fix", i), t)
            ),
        )
        return out.withColumn("corrected", corrected).drop("_fix")


class MaxEntProjectionEnsemble(Detector):
    """Random-projection model grid, majority vote (projection_ensemble.py:
    17-131). The engine twin is the seeded sign-projection linear model
    family of the oracle-green ``projection_ensemble_flags`` query:
    logit(m,c) = Σ_j sign(h64(seed_m_c_j))·x_j, argmax per model (ties →
    class asc), majority vote across models (ties → smallest class), flag
    vote ≠ label. One posexplode + broadcast grid join + groupBy — the
    reference's process fan-out as a single shuffle. ``label_col`` must be
    an integer class index in [0, n_classes)."""

    kind = "flagger"

    def __init__(
        self,
        id_col: str = "instance_id",
        label_col: str = "label",
        features_col: str = "embedded_instances",
        n_models: int = 3,
        n_classes: int = 4,
        seed: str = "proj",
    ):
        self.id_col, self.label_col, self.features_col = id_col, label_col, features_col
        self.n_models, self.n_classes, self.seed = n_models, n_classes, seed

    def _vote(self, df: DataFrame) -> DataFrame:
        from nessie_spark.functions.core import h64

        spark = df.sparkSession
        ex = df.select(
            _c(self.id_col).alias("_id"),
            F.posexplode(
                F.transform(_c(self.features_col), lambda v: v.cast("double"))
            ).alias("_j", "_x"),
        )
        grid = (
            spark.range(self.n_models)
            .select((F.col("id") + 1).cast("int").alias("_m"))
            .crossJoin(
                spark.range(self.n_classes).select(F.col("id").cast("int").alias("_cl"))
            )
        )
        sgn = F.when(
            F.pmod(h64(F.concat_ws("_", F.lit(self.seed), "_m", "_cl", "_j")), F.lit(2))
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        logits = (
            ex.crossJoin(F.broadcast(grid))
            .groupBy("_id", "_m", "_cl")
            .agg(F.round(F.sum(sgn * F.col("_x")), 6).alias("_logit"))
        )
        w = Window.partitionBy("_id", "_m").orderBy(F.desc("_logit"), F.asc("_cl"))
        preds = (
            logits.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select("_id", "_m", "_cl")
        )
        counts = preds.groupBy("_id", "_cl").agg(F.count(F.lit(1)).alias("_cnt"))
        vw = Window.partitionBy("_id").orderBy(F.desc("_cnt"), F.asc("_cl"))
        return (
            counts.withColumn("_vk", F.row_number().over(vw))
            .where(F.col("_vk") == 1)
            .select("_id", F.col("_cl").alias("_vote"))
        )

    def score(self, df: DataFrame) -> DataFrame:
        out = df.join(self._vote(df), _c(self.id_col) == F.col("_id"), "left").drop("_id")
        return out.withColumn(
            "flag", _c(self.label_col).cast("int") != F.col("_vote")
        ).drop("_vote")

    def correct(self, df: DataFrame) -> DataFrame:
        out = df.join(self._vote(df), _c(self.id_col) == F.col("_id"), "left").drop("_id")
        return out.withColumn("corrected", F.col("_vote")).drop("_vote")


def percentage_flagged(df: DataFrame, flag_col: str = "flag") -> DataFrame:
    """The reference's evaluation metric (metrics.py:4-5): one row with
    the instance count and the flagged fraction."""
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(_c(flag_col).cast("int")) / F.count(F.lit(1))).alias("flagged_fraction"),
    )


def evaluate(
    scored: DataFrame,
    score_col: str = "score",
    gold_col: str = "gold",
    id_col: str = "doc_id",
    ks: tuple[int, ...] = (10, 50, 100),
) -> DataFrame:
    """The reference's detector-evaluation flow (its paper workflow over
    metrics.py's module): rank instances by detector score (ties to id
    asc), grade the ranking against boolean/0-1 gold error flags, and
    return ONE row with average precision and precision-at-k in
    fixed-point ppm. Ranking + gold prefix sum run through
    plans.rank.global_prefix_rank — range-partitioned, never a
    single-task window — so grading 10^9 scored instances is a full-width
    job."""
    from nessie_spark.plans.rank import global_prefix_rank

    r = global_prefix_rank(
        scored.select(
            _c(id_col).alias("_id"),
            _c(gold_col).cast("int").alias("_gold"),
            _c(score_col).alias("_score"),
        ),
        [F.desc("_score"), F.asc("_id")],
        "_gold",
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("_gold").cast("bigint").alias("n_gold"),
        # zero gold-positive rows: AP is undefined — return 0 explicitly
        # rather than a silent NULL (r5 ADVICE #4)
        F.when(
            F.sum("_gold") > 0,
            F.round(
                F.lit(1e6)
                * F.sum(F.when(F.col("_gold") == 1, F.col("cum") / F.col("rn")))
                / F.sum("_gold")
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ap_ppm"),
    ]
    for k in ks:
        aggs.append(
            F.round(
                F.lit(1e6) * F.max(F.when(F.col("rn") == k, F.col("cum"))) / k
            )
            .cast("bigint")
            .alias(f"p_at_{k}_ppm")
        )
    return r.agg(*aggs)

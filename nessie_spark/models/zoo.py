"""Model zoo — the reference's Model contract re-expressed over pyspark.ml.

Reference contract (/root/reference/nessie/models/model.py:11-43):
``fit(X, y)``, ``predict(X)``, ``predict_proba(X)`` (a distribution over
all labels per item), ``score(X)`` (best score per item), plus a label
encoder. The reference zoo (models/text/__init__.py) wraps sklearn
LogisticRegression (maxent_text_classifier.py:1-11), LightGBM, fastText,
flair and transformer classifiers — all single-node libraries fed by a
driver-side feature matrix.

The engine keeps the contract but makes BOTH directions distributed:

* features stay in the DataFrame (``array<float>`` embedding column or a
  tokenized text column) — no driver-side matrix;
* fitting uses ``pyspark.ml`` estimators (JVM-side, treeAggregate-based
  LBFGS / distributed tree building), so a 10^9-row fit is a cluster job,
  not a ``collect()``;
* ``predict_proba`` returns the input DataFrame plus a ``probs``
  ``array<double>`` column ordered by label index 0..C-1 — the same
  (num_instances, num_labels) contract as the reference, kept lazy.

Determinism: every estimator gets a fixed seed; features and labels are
pure functions of the row. The reference's DummyTextClassifier
(dummy_text_classifier.py:12-37) emits *random* probabilities; the engine's
dummy follows the engine-wide seeded-determinism rule (util.py:98-112
analog) and emits the train-fold class priors instead — same shape, same
"no-information baseline" role, reproducible across engines (this is what
makes its CV query exact-oracle-checkable in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class SparkModel:
    """fit/predict_proba contract (reference model.py:11-43).

    ``fit(train)`` consumes a DataFrame with ``features`` (array<double>)
    or ``tokens`` (array<string>) and an integer ``label`` column in
    [0, n_classes); ``predict_proba(df)`` returns ``df`` plus ``probs``
    (array<double>, one slot per label) and ``pred`` (argmax label,
    ties broken on the lower label — the reference's np.argmax rule).
    """

    name: str = "SparkModel"

    def __init__(self, n_classes: int):
        self.n_classes = n_classes

    def fit(self, train: DataFrame) -> "SparkModel":
        raise NotImplementedError

    def predict_proba(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    # shared: pyspark.ml output → (probs padded to n_classes, ml columns
    # dropped, pred appended). A fold's train split may not contain every
    # global class — the model's probability vector is then shorter than C
    # and the missing classes pad with 0.0. ONE copy of this rule: the
    # classifier slots all call it, so the padding can never diverge.
    def _proba_out(self, transformed: DataFrame, fit_c: int) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        probs = vector_to_array(F.col("probability"))
        if fit_c < self.n_classes:
            probs = F.concat(
                probs, F.array_repeat(F.lit(0.0), self.n_classes - fit_c)
            )
        scored = transformed.withColumn("probs", probs).drop(
            "fvec", "rawPrediction", "probability", "prediction"
        )
        return self._with_pred(scored)

    # shared: pred = argmax(probs) with reference's first-max tie rule
    def _with_pred(self, scored: DataFrame) -> DataFrame:
        idx = F.array_position(
            F.col("probs"), F.array_max("probs")
        )  # 1-based first occurrence == np.argmax tie rule
        return scored.withColumn("pred", (idx - 1).cast("int"))


class DummyClassifier(SparkModel):
    """No-information baseline: probs = train class priors (see module
    docstring for the determinism note vs dummy_text_classifier.py:25-28).

    The fitted state is C doubles — broadcast as a literal array, so
    predict_proba is a zero-shuffle projection at any scale."""

    name = "dummy"

    def fit(self, train: DataFrame) -> "DummyClassifier":
        counts = {
            r["label"]: r["n"]
            for r in train.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        total = sum(counts.values())
        self.priors = [counts.get(c, 0) / total for c in range(self.n_classes)]
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        probs = F.array(*[F.lit(float(p)) for p in self.priors])
        return self._with_pred(df.withColumn("probs", probs))


class MaxEntClassifier(SparkModel):
    """MaxEnt / multinomial logistic regression
    (maxent_text_classifier.py:8-11: sklearn LogisticRegression over
    sentence embeddings) → ``pyspark.ml.classification.LogisticRegression``
    over the ``features`` array column. LBFGS runs as treeAggregate rounds
    on the executors — the distributed twin of sklearn's in-core solver."""

    name = "maxent"

    def __init__(self, n_classes: int, max_iter: int = 40, reg: float = 1e-3):
        super().__init__(n_classes)
        self.max_iter = max_iter
        self.reg = reg

    @staticmethod
    def _vec(df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import array_to_vector

        return df.withColumn("fvec", array_to_vector(F.col("features").cast("array<double>")))

    def fit(self, train: DataFrame) -> "MaxEntClassifier":
        from pyspark.ml.classification import LogisticRegression

        lr = LogisticRegression(
            featuresCol="fvec",
            labelCol="label",
            maxIter=self.max_iter,
            regParam=self.reg,
            family="multinomial",
            standardization=False,
        )
        self.model = lr.fit(self._vec(train))
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        return self._proba_out(
            self.model.transform(self._vec(df)), self.model.numClasses
        )


class GradientTreeClassifier(SparkModel):
    """Tree-ensemble zoo slot (the sklearn-generic role with a tree
    model_builder, sklean_text_classifier.py:14-37; boosted lightgbm is
    the separate ``gbt`` slot) → ``RandomForestClassifier`` (seeded):
    distributed tree induction over the same embedding features."""

    name = "trees"

    def __init__(
        self, n_classes: int, n_trees: int = 16, max_depth: int = 5, seed: int = 42
    ):
        super().__init__(n_classes)
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.seed = seed

    def fit(self, train: DataFrame) -> "GradientTreeClassifier":
        from pyspark.ml.classification import RandomForestClassifier

        rf = RandomForestClassifier(
            featuresCol="fvec",
            labelCol="label",
            numTrees=self.n_trees,
            maxDepth=self.max_depth,
            seed=self.seed,
        )
        if "_w" in train.columns:  # optional sample weights (spotter replay)
            rf.setWeightCol("_w")
        self.model = rf.fit(MaxEntClassifier._vec(train))
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        return self._proba_out(
            self.model.transform(MaxEntClassifier._vec(df)), self.model.numClasses
        )


class BagOfWordsNB(SparkModel):
    """Classic bag-of-words slot (the sklearn-generic role,
    sklean_text_classifier.py:14-37, with a count featurizer in place of
    the S-BERT embedder): HashingTF token counts → multinomial NaiveBayes.
    Hashing keeps the feature space fixed-width with zero vocab state, the
    property that matters at 10^12 rows."""

    name = "bow_nb"

    def __init__(self, n_classes: int, n_features: int = 1 << 12):
        super().__init__(n_classes)
        self.n_features = n_features

    def _tf(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import HashingTF

        tf = HashingTF(inputCol="tokens", outputCol="fvec", numFeatures=self.n_features)
        return tf.transform(df)

    def fit(self, train: DataFrame) -> "BagOfWordsNB":
        from pyspark.ml.classification import NaiveBayes

        nb = NaiveBayes(featuresCol="fvec", labelCol="label", modelType="multinomial")
        self.model = nb.fit(self._tf(train))
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        return self._proba_out(
            self.model.transform(self._tf(df)), self.model.numClasses
        )


class FastTextClassifier(SparkModel):
    """fastText zoo slot (fasttext_text_classifier.py:20-37: supervised
    fastText with ``wordNgrams=2, bucket=200000`` — a linear softmax over
    hashed word uni+bigram counts). Same model family re-expressed
    distributed: uni+bigram tokens → HashingTF bucket counts → multinomial
    ``LogisticRegression`` (treeAggregate L-BFGS instead of fastText's
    in-core SGD). The hashing trick IS fastText's bucket table, so the
    feature space stays fixed-width with zero vocab state at 10^12 rows."""

    name = "fasttext"

    def __init__(
        self,
        n_classes: int,
        n_buckets: int = 1 << 13,
        max_iter: int = 25,
        reg: float = 1e-4,
    ):
        super().__init__(n_classes)
        self.n_buckets = n_buckets
        self.max_iter = max_iter
        self.reg = reg

    def _tf(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import HashingTF

        n = F.size("tokens")
        # wordNgrams=2: append joined adjacent pairs to the unigram bag.
        # slice lengths clamp at 0 so 0/1-token rows yield no bigrams.
        bigrams = F.zip_with(
            F.slice(F.col("tokens"), 1, F.greatest(n - 1, F.lit(0))),
            F.slice(F.col("tokens"), 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        )
        grams = df.withColumn("_grams", F.concat(F.col("tokens"), bigrams))
        tf = HashingTF(inputCol="_grams", outputCol="fvec", numFeatures=self.n_buckets)
        return tf.transform(grams).drop("_grams")

    def fit(self, train: DataFrame) -> "FastTextClassifier":
        from pyspark.ml.classification import LogisticRegression

        lr = LogisticRegression(
            featuresCol="fvec",
            labelCol="label",
            maxIter=self.max_iter,
            regParam=self.reg,
            family="multinomial",
            standardization=False,
        )
        self.model = lr.fit(self._tf(train))
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        return self._proba_out(
            self.model.transform(self._tf(df)), self.model.numClasses
        )


class MLPClassifier(SparkModel):
    """Neural zoo slot (flair/transformer classifier role):
    ``MultilayerPerceptronClassifier`` — dense features → hidden layers →
    softmax, trained by distributed L-BFGS. The closest in-Spark analog of
    the reference's neural text classifiers with no external runtime."""

    name = "mlp"

    def __init__(
        self, n_classes: int, hidden: tuple = (32,), max_iter: int = 60, seed: int = 42
    ):
        super().__init__(n_classes)
        self.hidden = tuple(hidden)
        self.max_iter = max_iter
        self.seed = seed

    def fit(self, train: DataFrame) -> "MLPClassifier":
        from pyspark.ml.classification import MultilayerPerceptronClassifier

        v = MaxEntClassifier._vec(train)
        head = v.select("fvec").first()
        if head is None:
            raise ValueError("MLPClassifier.fit: empty training set")
        in_dim = head["fvec"].size
        mlp = MultilayerPerceptronClassifier(
            featuresCol="fvec",
            labelCol="label",
            layers=[in_dim, *self.hidden, self.n_classes],
            maxIter=self.max_iter,
            seed=self.seed,
        )
        self.model = mlp.fit(v)
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        out = self.model.transform(MaxEntClassifier._vec(df))
        scored = out.withColumn(
            "probs", vector_to_array(F.col("probability"))
        ).drop("fvec", "rawPrediction", "probability", "prediction")
        return self._with_pred(scored)


class GBTOneVsRest(SparkModel):
    """Boosted-trees zoo slot (lightgbm/xgboost classifier role): one
    seeded binary ``GBTClassifier`` per class — pyspark GBT is binary-only,
    so one-vs-rest is the standard multiclass lift. Class score = the
    binary model's P(positive), normalized across classes. C sequential
    fits, each a distributed boosting job; a class absent from the train
    fold contributes a constant 0 score (no degenerate single-class fit)."""

    name = "gbt"

    def __init__(
        self, n_classes: int, n_trees: int = 10, max_depth: int = 3, seed: int = 42
    ):
        super().__init__(n_classes)
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.seed = seed
        self._only: int | None = None

    def fit(self, train: DataFrame) -> "GBTOneVsRest":
        from pyspark.ml.classification import GBTClassifier

        v = MaxEntClassifier._vec(train)
        present = {r["label"] for r in v.select("label").distinct().collect()}
        if not present:
            raise ValueError("GBTOneVsRest.fit: empty training set")
        # degenerate single-class fold: no binary problem exists — predict
        # the one observed class outright (the prior), never all-zeros
        self._only = next(iter(present)) if len(present) == 1 else None
        self.models = []
        for c in range(self.n_classes):
            if c not in present or len(present) == 1:
                self.models.append(None)
                continue
            gbt = GBTClassifier(
                featuresCol="fvec",
                labelCol="_y",
                maxIter=self.n_trees,
                maxDepth=self.max_depth,
                seed=self.seed + c,
            )
            self.models.append(
                gbt.fit(v.withColumn("_y", (F.col("label") == c).cast("double")))
            )
        return self

    def predict_proba(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import vector_to_array

        if self._only is not None:
            probs = F.array(
                *[F.lit(1.0 if c == self._only else 0.0) for c in range(self.n_classes)]
            )
            return self._with_pred(df.withColumn("probs", probs))
        out = MaxEntClassifier._vec(df)
        for c, mdl in enumerate(self.models):
            if mdl is None:
                out = out.withColumn(f"_p{c}", F.lit(0.0))
                continue
            out = (
                mdl.transform(out)
                .withColumn(f"_p{c}", vector_to_array(F.col("probability"))[1])
                .drop("rawPrediction", "probability", "prediction")
            )
        total = sum(F.col(f"_p{c}") for c in range(self.n_classes))
        probs = F.array(
            *[F.col(f"_p{c}") / F.when(total > 0, total).otherwise(1.0)
              for c in range(self.n_classes)]
        )
        scored = out.withColumn("probs", probs).drop(
            "fvec", *[f"_p{c}" for c in range(self.n_classes)]
        )
        return self._with_pred(scored)


# The zoo registry (reference models/text/__init__.py:1-6): name -> factory.
ZOO = {
    "dummy": DummyClassifier,
    "maxent": MaxEntClassifier,
    "trees": GradientTreeClassifier,
    "bow_nb": BagOfWordsNB,
    "fasttext": FastTextClassifier,
    "mlp": MLPClassifier,
    "gbt": GBTOneVsRest,
}

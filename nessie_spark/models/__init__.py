"""Model zoo (O14) — Spark-native grafts of the reference's model layer.

Reference: /root/reference/nessie/models/ (model.py contract, text/ zoo,
featurizer.py). The reference wraps sklearn/flair/transformers; the engine
re-expresses the same fit / predict / predict_proba / label-set contract
over ``pyspark.ml`` estimators so training itself is distributed.
"""

from nessie_spark.models.zoo import ZOO, DummyClassifier, MaxEntClassifier, SparkModel
from nessie_spark.models.cv import cross_val_predict

__all__ = ["ZOO", "SparkModel", "DummyClassifier", "MaxEntClassifier", "cross_val_predict"]

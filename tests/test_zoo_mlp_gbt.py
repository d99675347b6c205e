"""MLP and GBT-OvR zoo slots: distribution contract on real embeddings
(learning itself is gated on the separable fixture in test_models.py's
test_zoo_separable_accuracy parametrization)."""

import pytest
from pyspark.sql import functions as F

from nessie_spark.models.zoo import GBTOneVsRest, MLPClassifier

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_split(spark):
    from nessie_spark.operators.modelzoo import _emb_features

    df = _emb_features(spark, SF)
    return df.where(F.col("vec_id") % 2 == 0), df.where(F.col("vec_id") % 2 == 1)


@pytest.mark.parametrize("factory", [MLPClassifier, GBTOneVsRest])
def test_contract_shape_on_real_embeddings(spark, emb_split, factory):
    train, test = emb_split
    out = factory(10).fit(train).predict_proba(test)
    agg = out.select(
        F.size("probs").alias("k"),
        F.abs(F.aggregate("probs", F.lit(0.0), lambda a, x: a + x) - 1.0).alias("d1"),
        F.col("pred").between(0, 9).cast("int").alias("ok"),
    ).agg(F.min("k"), F.max("k"), F.max("d1"), F.min("ok")).collect()[0]
    assert agg[0] == agg[1] == 10   # probs always length C
    assert agg[2] < 1e-6            # each row a normalized distribution
    assert agg[3] == 1              # pred in range


def test_gbt_ovr_handles_absent_class(spark, emb_split):
    train, test = emb_split
    m = GBTOneVsRest(10, n_trees=5).fit(train.where(F.col("label") != 2))
    rows = m.predict_proba(test.limit(20)).select("probs").collect()
    assert all(abs(r["probs"][2]) < 1e-12 for r in rows)  # absent class scores 0

"""Detector-evaluation metrics: hand-checked AP on a tiny fixture, the
api.evaluate() facade, and parity between the facade and the registry's
oracle-green detector_eval_* queries."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_ap_hand_checked(spark):
    """Golds at ranks 1 and 3 (score desc, id asc):
    AP = (1/1 + 2/3) / 2 = 0.833333… → 833333 ppm."""
    from nessie_spark.api import evaluate

    rows = [
        (1, 0.9, 1),
        (2, 0.8, 0),
        (3, 0.7, 1),
        (4, 0.6, 0),
    ]
    df = spark.createDataFrame(rows, "doc_id int, score double, gold int")
    out = evaluate(df, ks=(2,)).collect()[0]
    assert out["n"] == 4 and out["n_gold"] == 2
    assert out["ap_ppm"] == 833333
    # top-2 holds 1 gold → P@2 = 0.5
    assert out["p_at_2_ppm"] == 500000


def test_ap_ties_break_on_id(spark):
    """Equal scores rank by id asc: gold at id 2 with a score tie against
    id 1 lands at rank 2 → AP = 1/2."""
    from nessie_spark.api import evaluate

    rows = [(1, 0.5, 0), (2, 0.5, 1), (3, 0.1, 0)]
    df = spark.createDataFrame(rows, "doc_id int, score double, gold int")
    out = evaluate(df, ks=()).collect()[0]
    assert out["ap_ppm"] == 500000


def test_facade_matches_registry_queries(spark):
    """api.evaluate over the registry's scorer reproduces the oracle-green
    detector_eval_ap / detector_eval_p_at_k values exactly."""
    from nessie_spark.api import evaluate
    from nessie_spark.operators.evaluation import (
        EVAL_KS, detector_eval_ap, detector_eval_p_at_k, noisy_scored,
    )

    facade = evaluate(noisy_scored(spark, SF), ks=EVAL_KS).collect()[0]
    ap = detector_eval_ap(spark, SF).collect()[0]
    assert (facade["n"], facade["n_gold"], facade["ap_ppm"]) == (
        ap["n"], ap["n_gold"], ap["ap_ppm"],
    )
    for r in detector_eval_p_at_k(spark, SF).collect():
        assert facade[f"p_at_{r['k']}_ppm"] == r["p_at_k_ppm"]


def test_prefix_rank_distributed_matches_window(spark):
    """global_prefix_rank == the single-task window formulation,
    byte-for-byte, on a shuffled 1000-row frame."""
    from pyspark.sql.window import Window

    from nessie_spark.plans.rank import global_prefix_rank

    df = (
        spark.range(1000)
        .select(
            F.col("id"),
            (F.hash(F.col("id").cast("string")) % 97).alias("s"),
            (F.col("id") % 7 == 0).cast("int").alias("g"),
        )
        .repartition(13)
    )
    got = {
        r["id"]: (r["rn"], r["cum"])
        for r in global_prefix_rank(df, [F.desc("s"), F.asc("id")], "g").collect()
    }
    w = Window.orderBy(F.desc("s"), F.asc("id"))
    want = {
        r["id"]: (r["rn"], float(r["cum"]))
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("g").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .collect()
    }
    assert got == want

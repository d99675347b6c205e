"""Calibrator fit/transform ops (reference calibration.py:49-70 shape).

The Platt grouped-map has no SQL oracle (iterative IRLS), so its gate is
here: calibration must reduce ECE on the fixture and be deterministic."""

SF = "/root/testdata/sf0.01"


def _ece(rows, conf_field):
    import numpy as np

    conf = np.array([getattr(r, conf_field) for r in rows])
    correct = np.array([r.correct for r in rows], dtype=float)
    bins = np.minimum((conf * 10).astype(int), 9)
    n = len(rows)
    ece = 0.0
    for b in range(10):
        m = bins == b
        if m.sum():
            ece += (m.sum() / n) * abs(correct[m].mean() - conf[m].mean())
    return ece


def _with_correct(spark, df):
    import nessie_spark.operators.detectors2 as D2
    import pyspark.sql.functions as F

    base = D2._conf_folds(spark, SF).select("vec_id", "correct")
    return df.join(base, "vec_id").collect()


def test_platt_reduces_ece_and_is_deterministic(spark):
    import nessie_spark.operators.detectors2 as D2

    out1 = D2.calibration_platt_transform(spark, SF)
    rows = _with_correct(spark, out1)
    assert len(rows) == 500
    before = _ece(rows, "conf")
    after = _ece(rows, "conf_cal")
    assert after < before, (before, after)
    # determinism: second run bit-identical
    rows2 = _with_correct(spark, D2.calibration_platt_transform(spark, SF))
    assert sorted((r.vec_id, r.conf_cal) for r in rows2) == sorted(
        (r.vec_id, r.conf_cal) for r in rows
    )


def test_binned_transform_reduces_ece(spark):
    import nessie_spark.operators.detectors2 as D2

    rows = _with_correct(spark, D2.calibration_binned_transform(spark, SF))
    assert len(rows) == 500
    assert _ece(rows, "conf_cal") < _ece(rows, "conf")

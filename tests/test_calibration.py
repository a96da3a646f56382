"""Drift-threshold calibration (SURVEY.md A10 engine feature)."""

from semantic_log_detector_spark.checks.drift import calibrate_threshold


def test_calibrate_f1_separable(spark):
    # scores: positives ≥ 0.8, negatives ≤ 0.3 → any threshold in (0.3, 0.8]
    rows = [(0.9, 1), (0.8, 1), (0.85, 1), (0.1, 0), (0.2, 0), (0.3, 0)]
    df = spark.createDataFrame(rows, ["score", "label"])
    thr, f1 = calibrate_threshold(df, "score", "label")
    assert 0.3 < thr <= 0.8
    assert f1 == 1.0


def test_calibrate_youden(spark):
    rows = [(0.9, 1), (0.7, 1), (0.6, 0), (0.8, 0), (0.2, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, ["score", "label"])
    thr, j = calibrate_threshold(df, "score", "label", objective="youden")
    assert 0.0 < j <= 1.0

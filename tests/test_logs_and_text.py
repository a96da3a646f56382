"""Log source + text scalar functions (SURVEY.md S7, F1–F6, F9)."""

import pyspark.sql.functions as F

from semantic_log_detector_spark.functions.text import (
    extract_log_level,
    extract_timestamp,
    map_label,
    normalize_text,
    severity_bucket,
    stable_id,
)
from semantic_log_detector_spark.sources.logs import parse_logs, read_log_file, synth_logs


def test_synth_logs_deterministic(spark):
    a = synth_logs(spark, 500).collect()
    b = synth_logs(spark, 500).collect()
    assert a == b
    n_anom = sum(1 for r in a if r["is_anomaly"])
    assert 5 <= n_anom <= 60


def test_parse_logs_extracts_everything(spark):
    parsed = parse_logs(synth_logs(spark, 500)).cache()
    assert parsed.filter("ts IS NULL").count() == 0
    assert parsed.filter("log_level IS NULL").count() == 0
    levels = {r[0] for r in parsed.select("log_level").distinct().collect()}
    assert "WARNING" in levels  # WARN canonicalized (preprocessor.py:86-89)
    assert "WARN" not in levels
    assert parsed.filter(F.length("log_id") != 12).count() == 0
    # normalization replaced IPs and numbers
    leaked = parsed.filter(F.col("cleaned_text").rlike(r"\d+\.\d+\.\d+\.\d+")).count()
    assert leaked == 0
    parsed.unpersist()


def test_read_log_file(spark, tmp_path):
    p = tmp_path / "logs.txt"
    p.write_text(
        "2024-03-01 10:00:00 ERROR [auth] Failed login attempt for user_1 from 1.2.3.4\n"
        "\n"
        "2024-03-01T10:00:01 INFO [api] GET /api/v1/x returned 200 in 5ms\n"
    )
    df = read_log_file(spark, str(p))
    rows = df.collect()
    assert len(rows) == 2  # empty line dropped
    assert rows[0]["log_level"] in ("ERROR", "INFO")


def test_timestamp_extraction_families(spark):
    df = spark.createDataFrame(
        [("at 2024-03-01 10:00:00 x",), ("unix 1709287200 s",), ("none here",)],
        ["raw"],
    )
    out = df.select(extract_timestamp(F.col("raw")).alias("ts")).collect()
    assert out[0]["ts"] is not None
    assert out[1]["ts"] is not None
    assert out[2]["ts"] is None


def test_severity_and_label_map(spark):
    df = spark.createDataFrame([(0.95,), (0.75,), (0.55,), (0.1,)], ["s"])
    out = [r[0] for r in df.select(severity_bucket(F.col("s"))).collect()]
    assert out == ["Critical", "High", "Medium", "Low"]
    df2 = spark.createDataFrame([("BENIGN",), ("Web Attack XSS",), ("DDoS",)], ["lab"])
    mapped = [
        r[0]
        for r in df2.select(
            map_label(F.col("lab"), {"BENIGN": "benign"}, r"(?i)web\s*attack", "web_attack", "attack")
        ).collect()
    ]
    assert mapped == ["benign", "web_attack", "attack"]


def test_stable_id_deterministic(spark):
    df = spark.createDataFrame([("a", "b")], ["x", "y"])
    r1 = df.select(stable_id(F.col("x"), F.col("y"))).first()[0]
    r2 = df.select(stable_id(F.col("x"), F.col("y"))).first()[0]
    assert r1 == r2 and len(r1) == 12


def test_normalize_text_placeholders(spark):
    df = spark.createDataFrame(
        [("Conn from 10.0.0.1 path /var/log/app.log id 0xDEAD at 2024-01-01 10:00:00",)],
        ["t"],
    )
    out = df.select(normalize_text(F.col("t")).alias("n")).first()["n"]
    assert "<ip>" in out and "<path>" in out and "<hex>" in out and "<timestamp>" in out

"""Text-log source + parsing (SURVEY.md S7, F1–F5).

The reference parses raw log lines into ParsedLog records —
timestamp/level extraction, text normalization, deterministic log id
(`src/utils/preprocessor.py:192-223,26-30`) — one regex pass per row in
Python. Here the whole parse is a single Catalyst projection over
``spark.read.text`` (or any string column): codegen'd, no Python.

``synth_logs`` generates the seeded log fixture of FIXTURES.md §2,
mirroring the reference's template generator (`data/log_generator.py:
16-83`: 10 normal + anomaly templates, seed 42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    extract_log_level,
    extract_timestamp,
    normalize_text,
    stable_id,
)

SERVICES = ["auth", "api", "db", "cache", "worker", "scheduler", "gateway"]

_NORMAL_TEMPLATES = [
    "User login successful for user_{uid}",
    "GET /api/v1/resource/{uid} returned 200 in {ms}ms",
    "Scheduled job completed successfully job_{uid}",
    "Cache hit ratio {pct} percent",
    "Database connection pool size {n}",
    "Health check passed for node {ip}",
]
_ANOMALY_TEMPLATES = [
    "Failed login attempt for user_{uid} from {ip}",
    "SQL injection attempt detected in query param from {ip}",
    "Privilege escalation attempt by user_{uid}",
    "Unusual outbound transfer of {n} MB to {ip}",
]


def synth_logs(spark: SparkSession, n: int, seed: int = 42,
               anomaly_rate: float = 0.05) -> DataFrame:
    """Seeded raw-log fixture: (raw_text, is_anomaly) — Spark-native."""
    i = F.col("id")
    h = lambda tag: F.xxhash64(i, F.lit(seed), F.lit(tag))  # noqa: E731
    u = lambda tag: (F.pmod(h(tag), F.lit(10_000)) / 10_000.0)  # noqa: E731
    uid = F.pmod(h(1), F.lit(500)).cast("string")
    ms = F.pmod(h(2), F.lit(2000)).cast("string")
    pct = F.pmod(h(3), F.lit(100)).cast("string")
    cnt = F.pmod(h(4), F.lit(64)).cast("string")
    ip = F.concat_ws(
        ".",
        F.pmod(h(5), F.lit(256)).cast("string"),
        F.pmod(h(6), F.lit(256)).cast("string"),
        F.pmod(h(7), F.lit(256)).cast("string"),
        F.pmod(h(8), F.lit(256)).cast("string"),
    )
    ts = F.date_format(
        F.timestamp_seconds(F.lit(1704067200) + F.pmod(h(9), F.lit(30 * 86400))),
        "yyyy-MM-dd HH:mm:ss",
    )
    level_normal = F.element_at(
        F.array(F.lit("DEBUG"), F.lit("INFO"), F.lit("INFO"), F.lit("WARN")),
        F.pmod(h(10), F.lit(4)).cast("int") + 1,
    )
    service = F.element_at(
        F.array(*[F.lit(s) for s in SERVICES]), F.pmod(h(11), F.lit(len(SERVICES))).cast("int") + 1
    )

    def fill(tpl: str):
        out = F.lit(tpl)
        for token, col in (("{uid}", uid), ("{ms}", ms), ("{pct}", pct), ("{n}", cnt), ("{ip}", ip)):
            out = F.replace(out, F.lit(token), col)
        return out

    normal_msg = F.element_at(
        F.array(*[fill(t) for t in _NORMAL_TEMPLATES]),
        F.pmod(h(12), F.lit(len(_NORMAL_TEMPLATES))).cast("int") + 1,
    )
    anomaly_msg = F.element_at(
        F.array(*[fill(t) for t in _ANOMALY_TEMPLATES]),
        F.pmod(h(13), F.lit(len(_ANOMALY_TEMPLATES))).cast("int") + 1,
    )
    is_anom = u(14) < anomaly_rate
    msg = F.when(is_anom, anomaly_msg).otherwise(normal_msg)
    level = F.when(is_anom, F.lit("ERROR")).otherwise(level_normal)
    raw = F.concat_ws(" ", ts, level, F.concat(F.lit("["), service, F.lit("]")), msg)
    return spark.range(n).select(raw.alias("raw_text"), is_anom.alias("is_anomaly"))


def parse_logs(df: DataFrame, raw_col: str = "raw_text") -> DataFrame:
    """ParsedLog equivalent (preprocessor.py:14-30) as one projection:
    (raw_text, cleaned_text, ts, log_level, message, log_id)."""
    raw = F.col(raw_col)
    ts = extract_timestamp(raw)
    return df.select(
        raw.alias("raw_text"),
        normalize_text(raw).alias("cleaned_text"),
        ts.alias("ts"),
        extract_log_level(raw).alias("log_level"),
        F.trim(F.regexp_replace(raw, r"^\S+ \S+ \S+ \[\w+\]", "")).alias("message"),
        stable_id(raw, F.coalesce(ts.cast("string"), F.lit(""))).alias("log_id"),
        *([F.col("is_anomaly")] if "is_anomaly" in df.columns else []),
    )


def read_log_file(spark: SparkSession, path: str) -> DataFrame:
    """S7: text-file scan → parsed logs; empty lines dropped
    (preprocessor.py:243-263)."""
    raw = spark.read.text(path).withColumnRenamed("value", "raw_text")
    return parse_logs(raw.filter(F.length(F.trim("raw_text")) > 0))

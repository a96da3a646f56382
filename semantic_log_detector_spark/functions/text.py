"""Text scalar functions (SURVEY.md §2.8 F1–F6, F9) — all Catalyst-native.

Re-expresses the reference's per-row Python preprocessing
(`src/utils/preprocessor.py`) as chained built-in column expressions:
whole-stage-codegen'd, zero Python on the executor hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex families from preprocessor.py:42-47 (timestamps) and 49-52 (noise)
_TS_ISO = r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
_TS_SYSLOG = r"[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}"
_IP = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_HEX = r"\b0x[0-9a-fA-F]+\b"
_UUID = r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b"
_PATH = r"(?:/[\w.-]+){2,}"
_NUM = r"\b\d+\b"

LOG_LEVELS = ("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL", "FATAL", "WARN", "TRACE")


def extract_timestamp(col: Column) -> Column:
    """F1: coalesce over the reference's regex/strptime families
    (preprocessor.py:91-128): ISO-8601, syslog, unix seconds/millis."""
    # try_to_timestamp + nullif: ANSI mode raises on to_timestamp('')
    iso = F.try_to_timestamp(
        F.regexp_replace(F.nullif(F.regexp_extract(col, f"({_TS_ISO})", 1), F.lit("")), "T", " ")
    )
    unix_ms = F.regexp_extract(col, r"\b(1[5-9]\d{11})\b", 1)
    unix_s = F.regexp_extract(col, r"\b(1[5-9]\d{8})\b", 1)
    return F.coalesce(
        iso,
        F.try_to_timestamp(F.from_unixtime(F.nullif(unix_ms, F.lit("")).cast("long") / 1000)),
        F.try_to_timestamp(F.from_unixtime(F.nullif(unix_s, F.lit("")).cast("long"))),
    )


def extract_log_level(col: Column) -> Column:
    """F2: word-boundary level match + WARN→WARNING canonicalization
    (preprocessor.py:130-144)."""
    lvl = F.upper(F.regexp_extract(col, r"(?i)\b(" + "|".join(LOG_LEVELS) + r")\b", 1))
    return (
        F.when(lvl == "WARN", F.lit("WARNING"))
        .when(lvl == "", F.lit(None).cast("string"))
        .otherwise(lvl)
    )


def normalize_text(col: Column, max_len: int = 512) -> Column:
    """F3: the reference's normalization chain (preprocessor.py:146-190):
    structured tokens → placeholders, collapse whitespace, lower, truncate."""
    out = F.regexp_replace(col, _TS_ISO, "<TIMESTAMP>")
    out = F.regexp_replace(out, _TS_SYSLOG, "<TIMESTAMP>")
    out = F.regexp_replace(out, _UUID, "<UUID>")
    out = F.regexp_replace(out, _IP, "<IP>")
    out = F.regexp_replace(out, _HEX, "<HEX>")
    out = F.regexp_replace(out, _PATH, "<PATH>")
    out = F.regexp_replace(out, _NUM, "<NUM>")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.substring(F.lower(F.trim(out)), 1, max_len)


def stable_id(*cols: Column, length: int = 12) -> Column:
    """F4: deterministic row id = md5(concat)[:12] (preprocessor.py:26-30)."""
    return F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, length)


def severity_bucket(score: Column) -> Column:
    """F6: score → {Low,Medium,High,Critical} (explanation_engine.py:23-39)."""
    return (
        F.when(score >= 0.9, F.lit("Critical"))
        .when(score >= 0.7, F.lit("High"))
        .when(score >= 0.5, F.lit("Medium"))
        .otherwise(F.lit("Low"))
    )


def clamp(col: Column, lo: float, hi: float) -> Column:
    """F7: clamp to [lo, hi] (time_aware.py:95-109)."""
    return F.least(F.greatest(col, F.lit(lo)), F.lit(hi))


def map_label(col: Column, mapping: dict[str, str], fallback_pattern: str | None = None,
              fallback_value: str | None = None, default: str = "unknown") -> Column:
    """F9: dict label map + regex fallback (data_loader.py:35-66,200-222)."""
    expr = None
    for k, v in mapping.items():
        cond = col == k
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    if fallback_pattern:
        expr = expr.when(col.rlike(fallback_pattern), F.lit(fallback_value))
    return expr.otherwise(F.lit(default))

"""Canonical schemas for the validation engine.

The input contract is exactly ``BASELINE.json::input_hint``:
``(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string)``. Verdict / violation row shapes re-express the
reference's per-signal response record (`src/api/main.py:54-62`), the
AnomalyScore dataclass (`src/detection/anomaly_scorer.py:11-20`) and the
Explanation record (`src/utils/explanation_engine.py:9-17`) as flat Spark
rows with rule ids in the style of `src/rules/engine.py:30-52` (R001...).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- input table
CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
    ]
)

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ------------------------------------------------------------- engine outputs
# One row per (partition, rule): the reference's per-partition pass/fail.
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("observed", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
    ]
)

# One row per offending clip (or per offending aggregate when row-less):
# explainable violation rows — rule id, offending clip_id, observed vs
# expected stat, severity + human explanation (explanation_engine.py:23-77).
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("clip_id", T.StringType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("observed", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
        T.StructField("severity", T.StringType(), True),
        T.StructField("explanation", T.StringType(), True),
    ]
)

# Per-(partition, check) progress ledger row — resumable runs with lineage
# + metrics (generalizes the cache short-circuit of data_loader.py:356-362).
LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("check_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # done | failed
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("n_violations", T.LongType(), True),
        T.StructField("wall_ms", T.DoubleType(), True),
        T.StructField("input_fingerprint", T.StringType(), True),
        T.StructField("config_hash", T.StringType(), True),
        T.StructField("completed_at", T.TimestampType(), True),
    ]
)

SEVERITY_LEVELS = ["Low", "Medium", "High", "Critical"]

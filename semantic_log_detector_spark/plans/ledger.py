"""Per-partition progress ledger — checkpoint/resume with lineage + metrics.

Generalizes the reference's whole-dataset cache short-circuit
(`src/ids/data_loader.py:356-362`: "processed parquet exists → skip raw
ingest") to partition granularity: each (part_id, check_id) completion is a
ledger row carrying lineage (input fingerprint, config hash) and metrics
(rows, violations, wall). Resume = anti-join pending partitions against
completed ledger rows *with matching lineage* — a config or input change
invalidates prior completions automatically.

Storage is an append-only parquet directory (Iceberg-style table semantics
without requiring runtime jars — SURVEY.md §7.3): concurrent/dirty writers
only ever add files; readers dedupe by latest completed_at.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import LEDGER_SCHEMA


def append(
    spark: SparkSession,
    ledger_path: str,
    run_id: str,
    check_id: str,
    part_stats: list[tuple[int, int, int]],  # (part_id, n_rows, n_violations)
    wall_ms: float,
    input_fingerprint: str,
    config_hash: str,
    status: str = "done",
) -> None:
    now = _dt.datetime.now(tz=_dt.timezone.utc).replace(tzinfo=None)
    rows = [
        (run_id, int(p), check_id, status, int(nr), int(nv),
         float(wall_ms), input_fingerprint, config_hash, now)
        for p, nr, nv in part_stats
    ]
    if not rows:
        return
    # NB: coalesce(1) here is pathologically slow on parallelize()-backed
    # DataFrames (measured 5-8 s per call in local mode); repartition(1) is ~1 s
    spark.createDataFrame(rows, LEDGER_SCHEMA).repartition(1).write.mode("append").parquet(ledger_path)


def read(spark: SparkSession, ledger_path: str) -> DataFrame | None:
    if not _exists(ledger_path):
        return None
    return spark.read.parquet(ledger_path)


def completed_parts(
    spark: SparkSession,
    ledger_path: str,
    check_id: str,
    input_fingerprint: str,
    config_hash: str,
) -> set[int]:
    """part_ids already done for this (check, input, config) lineage."""
    return completed_map(spark, ledger_path, input_fingerprint, config_hash).get(
        check_id, set()
    )


def completed_map(
    spark: SparkSession,
    ledger_path: str,
    input_fingerprint: str,
    config_hash: str,
) -> dict[str, set[int]]:
    """check_id → completed part_ids, one ledger scan for the whole run
    (the runner tracks its own appends in-memory on top of this)."""
    led = read(spark, ledger_path)
    if led is None:
        return {}
    rows = (
        led.filter(
            (F.col("status") == "done")
            & (F.col("input_fingerprint") == input_fingerprint)
            & (F.col("config_hash") == config_hash)
        )
        .select("check_id", "part_id")
        .distinct()
        .collect()
    )
    out: dict[str, set[int]] = {}
    for r in rows:
        out.setdefault(r["check_id"], set()).add(r["part_id"])
    return out


def _exists(path: str) -> bool:
    if os.path.isdir(path):
        return any(f.endswith(".parquet") for f in os.listdir(path))
    return False

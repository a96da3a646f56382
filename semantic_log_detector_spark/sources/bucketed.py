"""Bucketed tables: shuffle-free equi-joins for repeated validation runs.

The referential check joins the clip table against transcripts on clip_id
every run. Unbucketed, EVERY run re-shuffles both sides on the join key —
at 10^12 clips that shuffle IS the job. Bucketing pays the shuffle once at
write time (``bucketBy(n, key)`` hash-places rows into fixed bucket files,
``sortBy`` pre-sorts them) and amortizes it over every later run: two
tables bucketed on the same key with the same bucket count sort-merge join
with NO Exchange on either side — the physical plan the test machine-
asserts. This is the plain-Spark form of the Iceberg bucket-partition
transform the deployment story uses (`SURVEY.md §4.2`).

Catalog caveat, stated plainly: bucket metadata lives in the session
catalog, not in the parquet files — a table written here is shuffle-free
for every query in catalogs that carry the bucketing spec (in-memory for
the session; Hive/Iceberg metastores at deployment). Reading the bare
directory with ``spark.read.parquet`` yields correct DATA but planless
buckets (Spark cannot trust file placement it has no metadata for).

Reference parity: the reference's id→row dict (`src/detection/
vector_db.py:65-68`) is the degenerate single-box version of "pay the
placement once, look up forever"; bucketing is the distributed restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str = "clip_id",
    buckets: int = 64,
) -> None:
    """Write ``df`` as an external parquet table hash-bucketed on ``key``.

    One write-time shuffle on ``key``; every later equi-join/groupBy on
    ``key`` against a co-bucketed table plans with zero Exchanges."""
    (
        df.write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table_name)
    )


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """The bucketed table, bucket spec intact (catalog read, not path)."""
    return spark.table(table_name)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan contains no shuffle Exchange — the
    machine check that co-bucketing actually eliminated the join shuffle
    (plan-audit device, used by tests and deploy smoke checks)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan

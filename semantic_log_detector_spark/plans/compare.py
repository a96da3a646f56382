"""Run-over-run comparison: did data quality regress since the last run?

A validation engine that only reports the CURRENT run makes the operator
do the diffing. This stage reads the verdict tables of two completed runs
(the `<out>/verdicts` parquet the runner writes) and emits one row per
rule: pass rates, violation counts, and a status verdict —

    REGRESSED  pass_rate dropped (beyond ``tolerance``) or violations grew
    IMPROVED   the opposite
    STABLE     within tolerance both ways
    NEW        rule present only in the current run (suite was widened)
    REMOVED    rule present only in the previous run

Scale: verdicts are ≤ partitions × rules rows by construction (the runner
coalesces them to one file), so both sides are trivially small regardless
of corpus size — this comparison costs nothing at 10^12 clips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _per_rule(spark: SparkSession, out_dir: str) -> DataFrame:
    v = spark.read.parquet(f"{out_dir}/verdicts")
    return v.groupBy("rule_id").agg(
        F.avg(F.col("passed").cast("double")).alias("pass_rate"),
        F.sum("n_violations").alias("n_violations"),
        F.count(F.lit(1)).alias("n_parts"),
    )


def compare_runs(
    spark: SparkSession,
    prev_out: str,
    cur_out: str,
    tolerance: float = 0.0,
) -> DataFrame:
    """Per-rule quality delta between two run output dirs. ``tolerance``
    is the pass-rate slack treated as STABLE (0 = any drop regresses)."""
    prev = _per_rule(spark, prev_out).select(
        "rule_id",
        F.col("pass_rate").alias("pass_rate_prev"),
        F.col("n_violations").alias("n_violations_prev"),
    )
    cur = _per_rule(spark, cur_out).select(
        "rule_id",
        F.col("pass_rate").alias("pass_rate_cur"),
        F.col("n_violations").alias("n_violations_cur"),
    )
    j = prev.join(cur, "rule_id", "full_outer")
    worse = (
        (F.col("pass_rate_cur") < F.col("pass_rate_prev") - F.lit(tolerance))
        | (F.col("n_violations_cur") > F.col("n_violations_prev"))
    )
    better = (
        (F.col("pass_rate_cur") > F.col("pass_rate_prev") + F.lit(tolerance))
        | (F.col("n_violations_cur") < F.col("n_violations_prev"))
    )
    status = (
        F.when(F.col("pass_rate_prev").isNull(), F.lit("NEW"))
        .when(F.col("pass_rate_cur").isNull(), F.lit("REMOVED"))
        .when(worse, F.lit("REGRESSED"))
        .when(better, F.lit("IMPROVED"))
        .otherwise(F.lit("STABLE"))
    )
    return j.select(
        "rule_id",
        F.round("pass_rate_prev", 6).alias("pass_rate_prev"),
        F.round("pass_rate_cur", 6).alias("pass_rate_cur"),
        "n_violations_prev",
        "n_violations_cur",
        status.alias("status"),
    ).orderBy("rule_id")

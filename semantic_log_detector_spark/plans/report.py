"""Run report: aggregate verdicts into run-level metric rows + markdown.

Recasts the reference's evaluator/report family (`src/ids/evaluator.py:
243-263`, `src/ids/report_generator.py:16-287`): per-rule pass rates and
violation totals from the verdicts table, a partition-level summary, and a
human-readable markdown block — all computed with Spark aggs, collected
only at the (tiny) rule/partition-summary granularity.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def summarize(spark: SparkSession, out_dir: str) -> dict:
    verdicts = spark.read.parquet(f"{out_dir}/verdicts")
    by_rule = (
        verdicts.groupBy("rule_id")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("n_passed"),
            F.sum("n_violations").alias("n_violations"),
            F.max("n_rows").alias("max_part_rows"),
        )
        .orderBy("rule_id")
        .collect()
    )
    failed_parts = (
        verdicts.filter(~F.col("passed"))
        .select("part_id", "rule_id", "observed")
        .orderBy("rule_id", "part_id")
        .limit(1000)
        .collect()
    )
    report = {
        "rules": [
            {
                "rule_id": r["rule_id"],
                "partitions": r["n_partitions"],
                "passed": r["n_passed"],
                "pass_rate": round(r["n_passed"] / max(r["n_partitions"], 1), 6),
                "violations": r["n_violations"],
            }
            for r in by_rule
        ],
        "failed_partitions": [
            {"part_id": r["part_id"], "rule_id": r["rule_id"], "observed": r["observed"]}
            for r in failed_parts
        ],
        "overall_passed": all(r["n_passed"] == r["n_partitions"] for r in by_rule),
    }
    return report


def write_report(spark: SparkSession, out_dir: str) -> dict:
    report = summarize(spark, out_dir)
    with open(f"{out_dir}/report.json", "w") as f:
        json.dump(report, f, indent=2)
    lines = [
        "# Validation run report",
        "",
        "| rule | partitions | passed | pass rate | violations |",
        "|---|---|---|---|---|",
    ]
    for r in report["rules"]:
        lines.append(
            f"| {r['rule_id']} | {r['partitions']} | {r['passed']} "
            f"| {r['pass_rate']:.4f} | {r['violations']} |"
        )
    lines.append("")
    lines.append(f"**Overall: {'PASS' if report['overall_passed'] else 'FAIL'}**")
    with open(f"{out_dir}/report.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    return report

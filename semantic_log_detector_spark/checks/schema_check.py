"""Declarative schema check (SURVEY.md S2/U2).

Reference: cross-file schema equality validation with intersect/except
diffing (`src/ids/data_loader.py:104-118,144-149`). Plan-time only — no
data is read. Missing / extra / type-mismatched columns become violation
rows (column-scoped, clip_id NULL, part_id = -1 ⇒ table-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .base import CheckResult, RunContext

R_MISSING = "R001_schema_missing_column"
R_EXTRA = "R002_schema_extra_column"
R_TYPE = "R003_schema_type_mismatch"
ALL_RULES = [R_MISSING, R_EXTRA, R_TYPE]


def schema_check(
    df: DataFrame,
    expected: T.StructType,
    ctx: RunContext,
    allow_extra: bool = True,
) -> CheckResult:
    spark = df.sparkSession
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    exp = {f.name: f.dataType.simpleString() for f in expected.fields}

    viols = []
    for name, dtype in exp.items():
        if name not in actual:
            viols.append((R_MISSING, name, None, dtype, "Critical", "expected column absent"))
        elif actual[name] != dtype:
            viols.append((R_TYPE, name, actual[name], dtype, "High", "column type differs"))
    if not allow_extra:
        for name in actual:
            if name not in exp and name not in {"part_id", "idx"}:
                viols.append((R_EXTRA, name, actual[name], None, "Low", "unexpected column present"))

    violation_rows = [
        (ctx.run_id, -1, rule, None, col, obs, expd, sev, expl)
        for rule, col, obs, expd, sev, expl in viols
    ]
    violations = spark.createDataFrame(
        violation_rows,
        schema="run_id string, part_id int, rule_id string, clip_id string, "
        "column string, observed string, expected string, severity string, explanation string",
    )
    n_by_rule = {r: sum(1 for v in viols if v[0] == r) for r in ALL_RULES}
    verdict_rows = [
        (ctx.run_id, -1, r, n == 0, 0, n, None, None) for r, n in n_by_rule.items()
    ]
    verdicts = spark.createDataFrame(
        verdict_rows,
        schema="run_id string, part_id int, rule_id string, passed boolean, "
        "n_rows long, n_violations long, observed string, expected string",
    )
    # driver-local twins: this check is plan-time only, so the runner can
    # sink these rows directly (pyarrow) without scheduling Spark jobs
    return CheckResult(
        "schema", verdicts, violations,
        metrics={"local_verdicts": verdict_rows, "local_violations": violation_rows},
    )

"""Run-over-run comparison: regressions, improvements, suite widening."""

import pyspark.sql.functions as F
import pytest

from semantic_log_detector_spark.plans.compare import compare_runs


def _write_verdicts(spark, out, rows):
    spark.createDataFrame(
        rows,
        "run_id string, part_id int, rule_id string, passed boolean,"
        " n_rows long, n_violations long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/verdicts")


@pytest.fixture(scope="module")
def two_runs(spark, tmp_path_factory):
    a = str(tmp_path_factory.mktemp("run_a"))
    b = str(tmp_path_factory.mktemp("run_b"))
    _write_verdicts(spark, a, [
        ("r1", 0, "R010", True, 100, 0), ("r1", 1, "R010", True, 100, 0),
        ("r1", 0, "R020", True, 100, 0), ("r1", 1, "R020", False, 100, 3),
        ("r1", 0, "R030", False, 100, 5), ("r1", 1, "R030", False, 100, 5),
        ("r1", 0, "ROLD", True, 100, 0),
    ])
    _write_verdicts(spark, b, [
        ("r2", 0, "R010", True, 100, 0), ("r2", 1, "R010", False, 100, 2),
        ("r2", 0, "R020", True, 100, 0), ("r2", 1, "R020", True, 100, 0),
        ("r2", 0, "R030", False, 100, 5), ("r2", 1, "R030", False, 100, 5),
        ("r2", 0, "RNEW", True, 100, 0),
    ])
    return a, b


def test_statuses(spark, two_runs):
    a, b = two_runs
    got = {r["rule_id"]: r["status"] for r in compare_runs(spark, a, b).collect()}
    assert got == {
        "R010": "REGRESSED",   # 1.0 -> 0.5, violations 0 -> 2
        "R020": "IMPROVED",    # 0.5 -> 1.0
        "R030": "STABLE",      # unchanged fail
        "RNEW": "NEW",
        "ROLD": "REMOVED",
    }


def test_tolerance(spark, two_runs):
    a, b = two_runs
    # with a huge tolerance the pass-rate drop is absorbed… but the
    # violation-count growth still regresses R010 (both signals count)
    got = {r["rule_id"]: r["status"]
           for r in compare_runs(spark, a, b, tolerance=1.0).collect()}
    assert got["R010"] == "REGRESSED"
    assert got["R030"] == "STABLE"


def test_real_suite_roundtrip(spark, tmp_path, meta_4k):
    """End-to-end over the actual runner outputs: same corpus twice is
    STABLE everywhere; dropping the null-sr rows IMPROVES R010."""
    from semantic_log_detector_spark.checks.base import RunContext
    from semantic_log_detector_spark.checks.row_rules import (
        default_clip_rules,
        run_row_rules,
    )

    def write(df, out):
        res = run_row_rules(df, default_clip_rules(), RunContext(run_id="c"))
        res.verdicts.coalesce(1).write.mode("overwrite").parquet(f"{out}/verdicts")

    a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
    write(meta_4k, a)
    write(meta_4k, b)
    write(meta_4k.filter("sr_hz IS NOT NULL"), c)

    same = compare_runs(spark, a, b)
    assert {r["status"] for r in same.collect()} == {"STABLE"}
    diff = {r["rule_id"]: r["status"] for r in compare_runs(spark, a, c).collect()}
    assert diff["R010_sr_null"] == "IMPROVED"

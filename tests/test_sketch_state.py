"""Mergeable sketch state: corpus-lifetime distincts/quantiles without
rescanning, and the R090 duplicate-feed overlap check."""

import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.plans.sketch_state import (
    corpus_rollup,
    feed_overlap,
    increment_sketch_row,
    write_increment_sketches,
)


def _clips(spark, lo, hi, seed=0):
    """Deterministic metadata-only clips with ids id{lo}..id{hi-1}."""
    return spark.range(lo, hi).select(
        F.concat(F.lit("id"), F.col("id")).alias("clip_id"),
        F.concat(F.lit("text "), (F.col("id") % 1000).cast("string"))
        .alias("transcript"),
        (1000 + (F.col("id") * 37) % 9000).cast("int").alias("dur_ms"),
        F.lit(16000).cast("int").alias("sr_hz"),
    )


def test_sketch_row_shape_and_estimates(spark):
    row = increment_sketch_row(_clips(spark, 0, 5000), "r1").collect()[0]
    assert row["run_id"] == "r1" and row["n_rows"] == 5000
    # HLL at lgK=14: ~0.8% rel std error — allow 3 sigma
    est = spark.createDataFrame([(bytearray(row["hll_clip_id"]),)], "h binary") \
        .select(F.hll_sketch_estimate("h").alias("e")).collect()[0]["e"]
    assert abs(est - 5000) / 5000 < 0.03
    # transcripts are mod-1000 → 1000 distinct
    est_t = spark.createDataFrame([(bytearray(row["hll_transcript"]),)],
                                  "h binary") \
        .select(F.hll_sketch_estimate("h").alias("e")).collect()[0]["e"]
    assert abs(est_t - 1000) / 1000 < 0.03


def test_rollup_accumulates_across_increments(spark, tmp_path):
    out = str(tmp_path / "out")
    # two disjoint increments + one full re-delivery of the first
    write_increment_sketches(spark, _clips(spark, 0, 4000), out, "r1")
    write_increment_sketches(spark, _clips(spark, 4000, 7000), out, "r2")
    write_increment_sketches(spark, _clips(spark, 0, 4000), out, "r3")

    r = corpus_rollup(spark, out).collect()[0]
    assert r["total_rows"] == 11000 and r["n_increments"] == 3
    # true distinct ids = 7000 (r3 re-sent r1's)
    assert abs(r["distinct_clip_ids"] - 7000) / 7000 < 0.03
    # duplicate_ratio ≈ 4000/11000
    assert abs(r["duplicate_ratio"] - 4000 / 11000) < 0.02
    # merged KLL quantiles: dur = 1000 + (i*37)%9000 ≈ uniform [1000,10000)
    assert 4800 <= r["dur_ms_p50"] <= 6200
    assert 9000 <= r["dur_ms_p95"] <= 10000


def test_feed_overlap_flags_redelivered_increment(spark, tmp_path):
    out = str(tmp_path / "out")
    write_increment_sketches(spark, _clips(spark, 0, 4000), out, "r1")
    write_increment_sketches(spark, _clips(spark, 4000, 7000), out, "r2")
    write_increment_sketches(spark, _clips(spark, 0, 4000), out, "r3")

    rows = {r["run_id"]: r for r in feed_overlap(spark, out).collect()}
    assert len(rows) == 3
    # first increment: no prior, passes
    assert rows["r1"]["overlap_ratio"] == 0.0 and rows["r1"]["passed"]
    # disjoint second increment: overlap within HLL noise
    assert rows["r2"]["overlap_ratio"] < 0.05 and rows["r2"]["passed"]
    # full re-delivery: overlap ≈ 1, flagged R090
    assert rows["r3"]["overlap_ratio"] > 0.9
    assert not rows["r3"]["passed"] and rows["r3"]["rule_id"] == "R090"


def test_validate_increment_writes_sketches(spark, tmp_path):
    from semantic_log_detector_spark.plans.incremental import validate_increment
    from semantic_log_detector_spark.plans.runner import SuiteConfig
    from semantic_log_detector_spark.sources.synth import clips_table

    table = str(tmp_path / "table")
    out = str(tmp_path / "out")
    cfg = SuiteConfig(num_parts=8, checks=("row_rules",))
    clips_table(spark, 300, seed=1, num_parts=8, with_bytes=True) \
        .write.mode("append").parquet(table)
    n, res = validate_increment(spark, table, out, cfg)
    assert n > 0
    st = spark.read.parquet(f"{out}/sketch_state")
    assert st.count() == 1
    row = st.collect()[0]
    assert row["run_id"] == res.run_id and row["n_rows"] == 300
    # rollup runs off the single increment too
    r = corpus_rollup(spark, out).collect()[0]
    assert r["total_rows"] == 300
    assert abs(r["distinct_clip_ids"] - 300) / 300 < 0.05


def test_sketch_build_never_reads_payload(spark):
    """Column pruning: the sketch agg's scan must not read ``bytes``."""
    import os
    import tempfile

    from semantic_log_detector_spark.sources.synth import clips_table

    d = tempfile.mkdtemp(prefix="sk_prune_")
    clips_table(spark, 200, num_parts=4, with_bytes=True) \
        .write.mode("overwrite").parquet(d)
    plan = increment_sketch_row(spark.read.parquet(d), "r") \
        ._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("bytes" not in ln for ln in scan_lines)
    for root, _, names in os.walk(d, topdown=False):
        for nm in names:
            os.unlink(os.path.join(root, nm))
        os.rmdir(root)


def test_rollup_empty_and_allnull_sketches(spark, tmp_path):
    # Round-5 ADVICE: a 0-row increment stores a NULL kll sketch; the
    # rollup must return explicit NULL quantiles, not IndexError/TypeError.
    out = str(tmp_path / "out")
    empty = _clips(spark, 0, 10).filter(F.lit(False))
    write_increment_sketches(spark, empty, out, "r_empty")
    r = corpus_rollup(spark, out).collect()[0]
    assert r["n_increments"] == 1 and r["total_rows"] == 0
    assert r["dur_ms_p50"] is None and r["dur_ms_p95"] is None
    assert r["duplicate_ratio"] is None
    # a real increment alongside the empty one: quantiles come back
    write_increment_sketches(spark, _clips(spark, 0, 2000), out, "r_real")
    r2 = corpus_rollup(spark, out).collect()[0]
    assert r2["n_increments"] == 2 and r2["dur_ms_p50"] is not None


def test_feed_overlap_timestamp_tie_still_flags_duplicate(spark, tmp_path):
    # Round-5 ADVICE: two increments with EQUAL recorded_at (coarse clock /
    # restored state) must still see each other through the run_id
    # tiebreak — a re-delivered feed in the tie cannot evade R090.
    out = str(tmp_path / "out")
    tie = 1700000000.0
    for run_id in ("r1", "r2"):  # r2 is a byte-identical re-delivery
        row = increment_sketch_row(_clips(spark, 0, 3000), run_id) \
            .withColumn("recorded_at", F.lit(tie))
        row.coalesce(1).write.mode("append").parquet(f"{out}/sketch_state")
    res = {r["run_id"]: r for r in feed_overlap(spark, out).collect()}
    assert res["r1"]["passed"]          # first in composite order: no prior
    assert not res["r2"]["passed"]      # the tie-breaking later run is caught
    assert res["r2"]["overlap_ratio"] > 0.9

"""applyInPandasWithState rolling drift: state persists across micro-batches,
a distribution shift in a later batch is flagged, a same-distribution batch
is not (reference src/monitoring/drift.py:18-47 recast with real state)."""

import time

import numpy as np
import pandas as pd
import pytest

from semantic_log_detector_spark.streaming.stateful import stream_rolling_drift


def _write_batch(spark, dirpath, rows):
    pdf = pd.DataFrame(rows, columns=["part_id", "dur_ms"])
    spark.createDataFrame(pdf.astype({"part_id": "int32", "dur_ms": "int64"})) \
        .repartition(1).write.mode("append").parquet(dirpath)


def test_rolling_drift_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rng = np.random.default_rng(0)

    # batch files written up-front; maxFilesPerTrigger=1 forces one
    # micro-batch per file so the state path is actually exercised
    normal1 = [(0, int(d)) for d in rng.normal(1000, 100, 400)]
    normal2 = [(0, int(d)) for d in rng.normal(1000, 100, 400)]
    shifted = [(0, int(d)) for d in rng.normal(6000, 200, 400)]
    _write_batch(spark, src, normal1)
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_batch(spark, src, normal2)
    time.sleep(1.1)
    _write_batch(spark, src, shifted)

    stream = (
        spark.readStream.schema("part_id int, dur_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_rolling_drift(stream, psi_threshold=0.2)
    q = (
        out.writeStream.format("memory")
        .queryName("rolling_drift")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM rolling_drift").collect(),
        key=lambda r: r["total_rows"],
    )
    assert len(rows) == 3
    # batch 1: no prior → unflagged; state initialized
    assert rows[0]["total_rows"] == 400 and rows[0]["flagged"] is False
    # batch 2: same distribution vs accumulated prior → low PSI
    assert rows[1]["total_rows"] == 800 and rows[1]["flagged"] is False
    assert rows[1]["psi"] < 0.1
    # batch 3: shifted distribution → high PSI, flagged (state carried the
    # 800-row prior across micro-batches)
    assert rows[2]["total_rows"] == 1200 and rows[2]["flagged"] is True
    assert rows[2]["psi"] > 1.0


def test_rolling_drift_multi_key_isolation(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    rng = np.random.default_rng(1)
    b1 = [(0, int(d)) for d in rng.normal(1000, 100, 300)] + \
         [(1, int(d)) for d in rng.normal(4000, 100, 300)]
    b2 = [(0, int(d)) for d in rng.normal(1000, 100, 300)] + \
         [(1, int(d)) for d in rng.normal(400, 50, 300)]  # key 1 shifts
    _write_batch(spark, src, b1)
    time.sleep(1.1)
    _write_batch(spark, src, b2)

    stream = (
        spark.readStream.schema("part_id int, dur_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_rolling_drift(stream, psi_threshold=0.2)
    q = (
        out.writeStream.format("memory")
        .queryName("rolling_drift2")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rolling_drift2").collect()
    second = {r["part_id"]: r for r in rows if r["total_rows"] == 600}
    assert second[0]["flagged"] is False  # key 0 stayed stable
    assert second[1]["flagged"] is True   # key 1 drifted; state is per-key


def test_rolling_drift_restart_from_checkpoint(spark, tmp_path):
    """The accumulated per-key prior must survive a full query restart via
    the state-store checkpoint (streaming analog of the ledger resume):
    run 1 sees only the normal batch; run 2 is a NEW query on the same
    checkpoint that sees a shifted batch — it must compare against the
    RESTORED 400-row prior, not start empty."""
    src = str(tmp_path / "src3")
    ckpt = str(tmp_path / "ckpt3")
    rng = np.random.default_rng(2)

    sink = str(tmp_path / "sink3")
    _write_batch(spark, src, [(0, int(d)) for d in rng.normal(1000, 100, 400)])
    stream = lambda: (
        spark.readStream.schema("part_id int, dur_ms long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # memory sink cannot recover from a checkpoint; the file sink is the
    # fault-tolerant path and is what production uses
    run = lambda: (
        stream_rolling_drift(stream(), psi_threshold=0.2)
        .writeStream.format("parquet")
        .option("path", sink)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q1 = run()
    q1.awaitTermination(120)
    rows1 = spark.read.parquet(sink).collect()
    assert len(rows1) == 1 and rows1[0]["total_rows"] == 400

    time.sleep(1.1)
    _write_batch(spark, src, [(0, int(d)) for d in rng.normal(6000, 200, 400)])
    q2 = run()
    q2.awaitTermination(120)
    rows = sorted(spark.read.parquet(sink).collect(), key=lambda r: r["total_rows"])
    assert len(rows) == 2  # only the new file is processed after restart
    assert rows[1]["total_rows"] == 800  # 400 restored prior + 400 new
    assert rows[1]["flagged"] is True and rows[1]["psi"] > 1.0

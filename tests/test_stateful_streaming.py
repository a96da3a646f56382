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


# ---------------------------------------------------------- feature drift

def _tone_rows(rng, n, lo_hz, hi_hz, part=0, sr=8000, dur_s=0.5):
    from semantic_log_detector_spark.functions.audio import encode_wav
    rows = []
    t = np.arange(int(sr * dur_s)) / sr
    for _ in range(n):
        f = rng.uniform(lo_hz, hi_hz)
        pcm = 0.5 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(len(t))
        rows.append((part, encode_wav(pcm.astype(np.float32), sr), "pcm_s16le"))
    return rows


def _write_clip_batch(spark, dirpath, rows):
    pdf = pd.DataFrame(rows, columns=["part_id", "bytes", "codec"])
    spark.createDataFrame(pdf.astype({"part_id": "int32"})) \
        .repartition(1).write.mode("append").parquet(dirpath)


_CLIP_STREAM_SCHEMA = "part_id int, bytes binary, codec string"


def test_feature_drift_spectral_shift_flags(spark, tmp_path):
    """The streaming twin of the batch drift check scores DECODED audio
    features: a later micro-batch whose tones move from the 100-1000 Hz
    band to 1500-3000 Hz must flag on centroid (and mfcc) PSI, with the
    same bins + smoothing as checks/drift.py so thresholds port over."""
    from semantic_log_detector_spark.streaming.stateful import stream_feature_drift

    src, ckpt = str(tmp_path / "fsrc"), str(tmp_path / "fckpt")
    rng = np.random.default_rng(7)
    _write_clip_batch(spark, src, _tone_rows(rng, 60, 100, 1000))
    time.sleep(1.1)
    _write_clip_batch(spark, src, _tone_rows(rng, 60, 100, 1000))
    time.sleep(1.1)
    _write_clip_batch(spark, src, _tone_rows(rng, 60, 1500, 3000))

    stream = (
        spark.readStream.schema(_CLIP_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stream_feature_drift(stream, psi_threshold=0.2)
    q = (
        out.writeStream.format("memory").queryName("feat_drift")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM feat_drift").collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["total_rows"], {})[r["feature"]] = r
    assert set(by_batch) == {60, 120, 180}
    # 15 features per (key, micro-batch); no decode errors on clean WAVs
    assert all(len(v) == 15 for v in by_batch.values())
    assert all(r["batch_errors"] == 0 for r in rows)
    # batch 1: no prior -> all unflagged
    assert not any(r["flagged"] for r in by_batch[60].values())
    # batch 2: same band -> stable
    assert not any(r["flagged"] for r in by_batch[120].values())
    # batch 3: spectral shift -> centroid drifts hard, several mfccs follow
    assert by_batch[180]["centroid"]["flagged"] is True
    assert by_batch[180]["centroid"]["psi"] > 1.0
    assert sum(r["flagged"] for r in by_batch[180].values()) >= 3
    # rms is band-independent -> must NOT flag (feature isolation)
    assert by_batch[180]["rms"]["flagged"] is False


def test_feature_drift_restart_and_bad_payload(spark, tmp_path):
    """Feature-drift state must survive a full query restart from the
    checkpoint, and undecodable payloads are counted (batch_errors), never
    crash the stateful operator or enter the histograms."""
    from semantic_log_detector_spark.streaming.stateful import stream_feature_drift

    src, ckpt, sink = (
        str(tmp_path / "rsrc"), str(tmp_path / "rckpt"), str(tmp_path / "rsink")
    )
    rng = np.random.default_rng(8)
    _write_clip_batch(spark, src, _tone_rows(rng, 60, 100, 1000))
    stream = lambda: (
        spark.readStream.schema(_CLIP_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    run = lambda: (
        stream_feature_drift(stream(), psi_threshold=0.2)
        .writeStream.format("parquet").option("path", sink)
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q1 = run()
    q1.awaitTermination(180)
    assert spark.read.parquet(sink).count() == 15  # one run, 15 features

    time.sleep(1.1)
    shifted = _tone_rows(rng, 57, 1500, 3000)
    shifted += [(0, b"not audio at all", "pcm_s16le"),
                (0, None, "pcm_s16le"), (0, b"", "pcm_s16le")]
    _write_clip_batch(spark, src, shifted)
    q2 = run()
    q2.awaitTermination(180)
    rows = [r for r in spark.read.parquet(sink).collect()
            if r["total_rows"] == 117]  # 60 restored prior + 57 decoded
    assert len(rows) == 15
    cent = {r["feature"]: r for r in rows}["centroid"]
    # restored 60-row prior (not an empty state) is what the shift scores against
    assert cent["flagged"] is True and cent["psi"] > 1.0
    assert all(r["batch_errors"] == 3 for r in rows)

"""`cli stream` e2e (round-5 verdict item 3): drop parquet clip files into
a watch dir, run the CLI, assert violation rows, windowed twin outputs,
checkpointed exactly-once resume across invocations, and the stream
report. Windows flush when a LATER run's data advances the watermark —
the documented deferral contract, exercised here across three runs."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from semantic_log_detector_spark import cli
from semantic_log_detector_spark.functions.audio import encode_wav

SR = 8000
T0 = pd.Timestamp("2026-01-01 10:00:00")


def _tone(sec=0.5, f=220.0):
    t = np.arange(int(SR * sec)) / SR
    return encode_wav((0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32), SR)


def _rows(ids, ts, transcript="hello spark streaming world check",
          codec="pcm_s16le", sr=SR, dur=500):
    buf = _tone()
    return [
        {"clip_id": i, "bytes": buf, "sr_hz": sr, "dur_ms": dur,
         "codec": codec, "transcript": transcript, "ts": ts}
        for i in ids
    ]


def _write(spark, rows, path):
    pdf = pd.DataFrame(rows)
    sdf = spark.createDataFrame(
        pdf, "clip_id string, bytes binary, sr_hz int, dur_ms int,"
             " codec string, transcript string, ts timestamp")
    sdf.repartition(1).write.mode("append").parquet(path)


@pytest.fixture(scope="module")
def stream_run(spark, tmp_path_factory):
    watch = str(tmp_path_factory.mktemp("watch"))
    out = str(tmp_path_factory.mktemp("streamout"))
    base = str(tmp_path_factory.mktemp("baseline"))

    # vocab baseline: the normal transcript domain
    _write(spark, _rows([f"b{i}" for i in range(40)], T0), base)

    # --- run 1: normal clips + planted violations + an in-window dup pair
    rows = _rows([f"c{i:03d}" for i in range(30)], T0)
    rows += _rows(["dup01", "dup01"], T0 + pd.Timedelta(seconds=5))
    rows += [
        {"clip_id": "bad_sr", "bytes": _tone(), "sr_hz": 192_000,
         "dur_ms": 500, "codec": "pcm_s16le",
         "transcript": "x" * 10, "ts": T0},                    # R011
        {"clip_id": "bad_codec", "bytes": _tone(), "sr_hz": SR,
         "dur_ms": 500, "codec": "vorbis",
         "transcript": "y" * 10, "ts": T0},                    # R014
        {"clip_id": "no_bytes", "bytes": None, "sr_hz": SR,
         "dur_ms": 500, "codec": "pcm_s16le",
         "transcript": "z" * 10, "ts": T0},                    # R016
    ]
    _write(spark, rows, watch)
    argv = ["stream", "--watch", watch, "--out", out,
            "--payload", "--vocab-baseline", base,
            "--window", "60 seconds", "--watermark", "2 minutes"]
    assert cli.main(argv) == 0

    # --- run 2: an hour later, a DRIFTED-vocab window (advances the
    # watermark past run 1's windows, flushing dup_ids + vocab for T0)
    t1 = T0 + pd.Timedelta(hours=1)
    _write(spark, _rows([f"d{i:03d}" for i in range(30)], t1,
                        transcript="zzqx vvbn kkjw qqpz mmtr"), watch)
    assert cli.main(argv) == 0

    # --- run 3: two hours later, normal again (flushes run 2's windows)
    t2 = T0 + pd.Timedelta(hours=2)
    _write(spark, _rows([f"e{i:03d}" for i in range(10)], t2), watch)
    assert cli.main(argv) == 0
    return watch, out


def test_stream_cli_row_violations(spark, stream_run):
    _, out = stream_run
    viol = spark.read.parquet(f"{out}/violations")
    by_rule = {r["rule_id"] for r in viol.select("rule_id").distinct().collect()}
    assert {"R011_sr_range", "R014_codec_allowed", "R016_bytes_present"} <= by_rule
    got = {r["clip_id"] for r in viol.collect()}
    assert {"bad_sr", "bad_codec", "no_bytes"} <= got


def test_stream_cli_exactly_once(spark, stream_run):
    # three runs over a cumulative watch dir: each planted violation row
    # appears exactly once (the checkpoint skips already-seen files)
    _, out = stream_run
    viol = spark.read.parquet(f"{out}/violations")
    n = viol.filter("clip_id = 'bad_sr' and rule_id = 'R011_sr_range'").count()
    assert n == 1


def test_stream_cli_windowed_dups_flush_on_later_run(spark, stream_run):
    _, out = stream_run
    dups = spark.read.parquet(f"{out}/dup_ids").collect()
    assert any(r["clip_id"] == "dup01" and r["n_dups"] == 2 for r in dups)


def test_stream_cli_vocab_drift_fails_drifted_window(spark, stream_run):
    _, out = stream_run
    vd = {r["window_start"]: r for r in
          spark.read.parquet(f"{out}/vocab_drift").collect()}
    assert vd, "no vocab windows closed"
    t1 = (T0 + pd.Timedelta(hours=1)).to_pydatetime()
    drifted = [r for w, r in vd.items() if w == t1]
    assert drifted and not drifted[0]["passed"]  # R091 on the drifted window
    normal = [r for w, r in vd.items() if w == T0.to_pydatetime()]
    assert normal and normal[0]["passed"]


def test_stream_cli_speech_health_and_report(spark, stream_run):
    _, out = stream_run
    sh = spark.read.parquet(f"{out}/speech_health").collect()
    assert sh and all(r["n_undecodable"] <= r["n_clips"] for r in sh)
    t0_rows = [r for r in sh if r["window_start"] == T0.to_pydatetime()]
    assert t0_rows and t0_rows[0]["n_undecodable"] >= 1  # the no_bytes clip
    rep = json.load(open(f"{out}/stream_report.json"))
    assert set(rep["sinks"]) == {"violations", "dup_ids", "speech_health",
                                 "vocab_drift"}
    assert rep["sinks"]["violations"]["rows"] > 0
    assert rep["sinks"]["violations"]["by_rule"]["R016_bytes_present"] == 1
    assert os.path.isdir(f"{out}/_checkpoints")

"""R067 speech rate: transcript word count vs VAD-measured speech seconds.

Planted corpus: every violation class (too wordy for the speech time,
transcript over silence, implausibly short transcript, empty transcript
under speech) is caught by clip_id; paired clips, fake decodes, and clips
with no transcript row are not flagged. Also pins the O(n) cumsum VAD
kernel against the segmentation kernel's speech_s.
"""

import numpy as np
import pytest

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.drift import R_SPEECH_RATE, drift_check
from semantic_log_detector_spark.functions.audio import encode_wav

CTX = RunContext(run_id="t", num_parts=4)
SR = 16000


def _tone(seconds: float, freq: float = 440.0, amp: float = 0.3) -> bytes:
    t = np.arange(int(seconds * SR)) / SR
    return encode_wav((amp * np.sin(2 * np.pi * freq * t)).astype(np.float32), SR)


def _silence(seconds: float) -> bytes:
    return encode_wav(np.zeros(int(seconds * SR), dtype=np.float32), SR)


def _words(n: int) -> str:
    return " ".join(f"w{i}" for i in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        ("ok_pair", _tone(3.0), "pcm_s16le", 10),      # ~3.3 wps → pass
        ("too_fast", _tone(3.0), "pcm_s16le", 60),     # 20 wps → violation
        ("silent_txt", _silence(5.0), "pcm_s16le", 20),  # speech 0 s → violation
        ("too_slow", _tone(6.0), "pcm_s16le", 1),      # 0.17 wps → violation
        ("empty_txt", _tone(3.0), "pcm_s16le", 0),     # "" under speech → violation
        ("fake_codec", b"\x00" * 400, "opus", 30),     # fake decode → skipped
        ("no_transcript", _tone(3.0), "pcm_s16le", None),  # referential's job
    ]
    clips = spark.createDataFrame(
        [(cid, payload, codec, SR, None) for cid, payload, codec, _ in rows],
        "clip_id string, bytes binary, codec string, sr_hz int, dur_ms int",
    )
    transcripts = spark.createDataFrame(
        [(cid, _words(n)) for cid, _, _, n in rows if n is not None],
        "clip_id string, transcript string",
    )
    res = drift_check(clips, CTX, transcripts=transcripts)
    try:
        yield res
    finally:
        res.release()


def test_flags_exactly_the_planted_mismatches(planted):
    flagged = {
        r["clip_id"]
        for r in planted.violations.filter(
            f"rule_id = '{R_SPEECH_RATE}'").collect()
    }
    assert flagged == {"too_fast", "silent_txt", "too_slow", "empty_txt"}


def test_verdict_rows_cover_every_partition(planted):
    rows = planted.verdicts.filter(f"rule_id = '{R_SPEECH_RATE}'").collect()
    assert sum(r["n_violations"] for r in rows) == 4
    # the grid covers every partition that has clips, pass or fail
    assert all((r["n_violations"] == 0) == r["passed"] for r in rows)


def test_explanations_distinguish_fast_from_slow(planted):
    v = {r["clip_id"]: r["explanation"] for r in planted.violations.filter(
        f"rule_id = '{R_SPEECH_RATE}'").collect()}
    assert "too wordy" in v["too_fast"] and "too wordy" in v["silent_txt"]
    assert "short transcript" in v["too_slow"]
    assert "short transcript" in v["empty_txt"]


def test_disabled_without_transcripts(spark):
    clips = spark.createDataFrame(
        [("a", _tone(1.0), "pcm_s16le", SR, None)],
        "clip_id string, bytes binary, codec string, sr_hz int, dur_ms int",
    )
    res = drift_check(clips, CTX)
    try:
        assert res.verdicts.filter(f"rule_id = '{R_SPEECH_RATE}'").count() == 0
        # no per-clip speech rows leave the stage when the rule is off
        assert res.resources[0].filter("kind = 's'").count() == 0
    finally:
        res.release()


def test_cumsum_kernel_matches_segmentation_kernel():
    """speech_ms_fast (O(n) cumsum) vs the window-matrix kernel on a
    planted two-burst signal: same segments, same total within one hop."""
    from semantic_log_detector_spark.operators.segment import (
        DEFAULT_THRESHOLD_DBFS,
        FRAME_MS,
        HOP_MS,
        _frame_rms_db,
        _segments_from_mask,
        speech_ms_fast,
    )

    rng = np.random.default_rng(7)
    pcm = np.zeros(SR * 6, dtype=np.float64)
    pcm[SR : 2 * SR] = 0.2 * rng.standard_normal(SR)
    pcm[4 * SR : 5 * SR + SR // 2] = 0.3 * rng.standard_normal(SR + SR // 2)
    db = _frame_rms_db(pcm, SR, FRAME_MS, HOP_MS)
    segs = _segments_from_mask(db >= DEFAULT_THRESHOLD_DBFS,
                               HOP_MS / 1000.0, FRAME_MS / 1000.0, 0.1, 0.15)
    dur = len(pcm) / SR
    want_ms = 1000.0 * sum(min(t1, dur) - t0 for t0, t1 in segs)
    got_ms = speech_ms_fast(pcm, SR)
    assert abs(got_ms - want_ms) <= HOP_MS


def test_suite_emits_speech_rate_verdicts(spark, tmp_path):
    """run_suite wires R067 end-to-end over the synthetic corpus; the
    planted silent-with-transcript clips come out as violations."""
    from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite
    from semantic_log_detector_spark.sources.synth import (
        clips_table,
        transcripts_table,
    )

    clips = clips_table(spark, 600, num_parts=8, with_bytes=True)
    transcripts = transcripts_table(spark, 600)
    cfg = SuiteConfig(num_parts=8, checks=("drift",))
    run_suite(spark, clips, transcripts, str(tmp_path / "out"), cfg)
    verdicts = spark.read.parquet(str(tmp_path / "out" / "verdicts"))
    rows = verdicts.filter(f"rule_id = '{R_SPEECH_RATE}'").collect()
    assert len(rows) == 8  # one verdict per partition, pass or fail
    # and the rule can be switched off
    cfg_off = SuiteConfig(num_parts=8, checks=("drift",), speech_rate=False)
    run_suite(spark, clips, transcripts, str(tmp_path / "out2"), cfg_off)
    v2 = spark.read.parquet(str(tmp_path / "out2" / "verdicts"))
    assert v2.filter(f"rule_id = '{R_SPEECH_RATE}'").count() == 0

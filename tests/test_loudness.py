"""BS.1770-style integrated loudness: known-answer anchors + engine wiring.

The standard's own calibration statement is the oracle: a 0 dBFS 997 Hz
sine reads −3.01 LUFS. Gain linearity, gating behavior, silence policy,
and the curation/augmentation integrations are pinned on top.
"""

import numpy as np
import pytest

from semantic_log_detector_spark.functions.loudness import (
    _SHELF_A48,
    _SHELF_B48,
    _biquad_highpass,
    _biquad_highshelf,
    integrated_lufs,
    k_weight_response,
    lufs_gain_db,
)


def _sine(sr, seconds=2.0, freq=997.0, amp=1.0):
    t = np.arange(int(sr * seconds)) / sr
    return amp * np.sin(2 * np.pi * freq * t)


def test_rerate_reproduces_spec_at_48k():
    b, a = _biquad_highshelf(48000.0)
    assert np.allclose(b, _SHELF_B48) and np.allclose(a, _SHELF_A48)
    b, a = _biquad_highpass(48000.0)
    assert np.allclose(b / a[0] * a[0], b)  # well-formed
    assert np.allclose(a[1] / a[0], -1.99004745483398, atol=1e-10)


def test_bs1770_anchor_0dbfs_997hz():
    """BS.1770: 'if a 0 dBFS 997 Hz sine is applied, the indicated
    loudness equals −3.01 LKFS'. Exact at the spec's 48 kHz; the bilinear
    re-rate warps low rates slightly (−2.98 at 16 kHz) — bounded here."""
    assert integrated_lufs(_sine(48000), 48000) == pytest.approx(-3.01, abs=0.01)
    assert integrated_lufs(_sine(44100), 44100) == pytest.approx(-3.01, abs=0.02)
    assert integrated_lufs(_sine(16000), 16000) == pytest.approx(-3.01, abs=0.05)


def test_gain_linearity_and_normalization():
    x = _sine(16000, amp=0.1)  # −20 dBFS → ≈ −23 LUFS
    l0 = integrated_lufs(x, 16000)
    assert l0 == pytest.approx(-23.0, abs=0.05)
    # +6 dB of gain is +6 LU of loudness, exactly
    l6 = integrated_lufs(x * 2.0, 16000)
    assert l6 - l0 == pytest.approx(20 * np.log10(2.0), abs=1e-6)
    # lufs_gain_db round-trips to the target
    g = lufs_gain_db(x, 16000, -23.0)
    assert integrated_lufs(x * 10 ** (g / 20), 16000) == pytest.approx(-23.0, abs=1e-6)


def test_k_weighting_shape():
    """RLB high-pass crushes 20 Hz; the head shelf adds ≈ +4 dB at 10 kHz."""
    h = 20 * np.log10(np.abs(k_weight_response(
        np.array([20.0, 997.0, 10000.0]), 48000.0)))
    assert h[0] < -10.0
    assert h[1] == pytest.approx(0.691 / 2, abs=0.35)  # ≈ +0.69 dB power
    assert h[2] == pytest.approx(4.0, abs=0.3)


def test_silence_and_gating():
    assert integrated_lufs(np.zeros(32000), 16000) is None
    assert integrated_lufs(np.array([]), 16000) is None
    assert lufs_gain_db(np.zeros(32000), 16000, -23.0) == 0.0
    # relative gate: loud content + long quiet tail → loudness tracks the
    # loud part, not the average (an ungated mean would be much lower)
    sr = 16000
    loud = _sine(sr, seconds=2.0, amp=0.3)
    quiet = _sine(sr, seconds=8.0, amp=0.003)  # −50 dBFS: above abs gate
    l_mix = integrated_lufs(np.concatenate([loud, quiet]), sr)
    l_loud = integrated_lufs(loud, sr)
    ungated_ms_db = 10 * np.log10((np.mean(loud**2) * 2 + np.mean(quiet**2) * 8) / 10)
    assert abs(l_mix - l_loud) < 1.0
    assert l_mix > ungated_ms_db + 3.0  # clearly not the ungated mean


def test_profile_carries_loudness_and_gate_accounts(spark):
    """audio_profile emits loudness_lufs from the same decode pass; the
    curation loudness gate drops exactly the out-of-range clips into the
    out_of_loudness bucket; with_loudness=False leaves the column null."""
    from semantic_log_detector_spark.functions.audio import encode_wav
    from semantic_log_detector_spark.operators.audio_curate import (
        audio_curation_summary,
        audio_profile,
        curate_audio_corpus,
    )
    from semantic_log_detector_spark.operators.dedup import unpersist_all

    sr = 16000
    rng = np.random.default_rng(7)

    def speechy(amp):
        # amplitude-modulated noise bursts: passes the VAD speech gate
        t = np.arange(sr * 2) / sr
        env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(float)
        return (amp * env * rng.standard_normal(len(t))).astype(np.float32)

    rows = [
        ("normal", encode_wav(speechy(0.2), sr), "pcm_s16le"),
        ("very_quiet", encode_wav(speechy(0.02), sr), "pcm_s16le"),
        ("silent", encode_wav(np.zeros(sr, np.float32), sr), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")

    prof = audio_profile(df).toPandas().set_index("clip_id")
    assert prof.loc["normal", "loudness_lufs"] > -25
    assert prof.loc["very_quiet", "loudness_lufs"] < -30
    assert np.isnan(prof.loc["silent", "loudness_lufs"])

    prof_off = audio_profile(df, with_loudness=False).toPandas()
    assert prof_off["loudness_lufs"].isna().all()

    stats = {}
    kept = curate_audio_corpus(df, min_speech_ratio=0.2, min_lufs=-30.0,
                               drop_stats=stats)
    kept_ids = {r["clip_id"] for r in kept.collect()}
    assert kept_ids == {"normal"}
    full_prof = audio_profile(df)
    buckets = {
        r["bucket"]: r["n_clips"]
        for r in audio_curation_summary(
            full_prof, kept, min_speech_ratio=0.2, min_lufs=-30.0
        ).collect()
    }
    # silent fails the speech gate first (ratio 0); very_quiet is speechy
    # but out of loudness; accounting still sums to the input
    assert buckets.get("out_of_loudness") == 1
    assert sum(buckets.values()) == 3
    unpersist_all(stats)


def test_augment_lufs_norm(spark):
    """The lufs_norm augmentation moves every decodable clip to the target
    integrated loudness."""
    from semantic_log_detector_spark.functions.audio import decode_clip, encode_wav
    from semantic_log_detector_spark.operators.augment import AugSpec, augment_clips

    sr = 16000
    rows = [
        ("a", encode_wav(_sine(sr, amp=0.05).astype(np.float32), sr), "pcm_s16le"),
        ("b", encode_wav(_sine(sr, amp=0.6).astype(np.float32), sr), "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = augment_clips(
        df, specs=(AugSpec("lufs23", "lufs_norm", {"target_lufs": -23.0}),)
    ).collect()
    assert len(out) == 2 and all(r["ok"] for r in out)
    for r in out:
        pcm, got_sr = decode_clip(bytes(r["bytes"]), "pcm_s16le")
        # int16 quantization costs a hair of precision
        assert integrated_lufs(pcm, got_sr) == pytest.approx(-23.0, abs=0.05)

"""Audio augmentation: deterministic corpus expansion (speed/gain/noise/
loudness), no silent drops, payloads valid through the engine's own
decode + validation path."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from semantic_log_detector_spark.operators.augment import (
    AugSpec,
    add_noise_snr,
    augment_clips,
    gain,
    rms_normalize,
    speed_perturb,
)

# ------------------------------------------------------------ kernel level


def _tone(sr=16000, dur_s=1.0, f=440.0, amp=0.4, noise=0.02, seed=9):
    t = np.arange(int(sr * dur_s)) / sr
    rng = np.random.default_rng(seed)
    return (amp * np.sin(2 * np.pi * f * t)
            + noise * rng.standard_normal(len(t))).astype(np.float32)


def test_speed_perturb_length_and_content():
    pcm = _tone()
    faster = speed_perturb(pcm, 1.1)
    slower = speed_perturb(pcm, 0.9)
    assert len(faster) == round(len(pcm) / 1.1)
    assert len(slower) == round(len(pcm) / 0.9)
    # identity factor is exactly identity
    assert np.array_equal(speed_perturb(pcm, 1.0), pcm)
    # energy is preserved to first order (interpolation, not windowing)
    assert abs(np.std(faster) - np.std(pcm)) < 0.02


def test_add_noise_hits_target_snr_and_is_keyed():
    pcm = _tone(noise=0.0)
    noisy = add_noise_snr(pcm, 20.0, key=123)
    resid = noisy - pcm
    snr = 10 * np.log10(np.mean(pcm ** 2) / np.mean(resid ** 2))
    assert abs(snr - 20.0) < 0.5
    assert np.array_equal(noisy, add_noise_snr(pcm, 20.0, key=123))
    assert not np.array_equal(noisy, add_noise_snr(pcm, 20.0, key=124))


def test_gain_and_rms_normalize():
    pcm = _tone()
    assert np.allclose(gain(pcm, 6.0), pcm * 10 ** 0.3, atol=1e-6)
    normed = rms_normalize(pcm, target_dbfs=-20.0)
    rms_db = 20 * np.log10(np.sqrt(np.mean(normed.astype(np.float64) ** 2)))
    assert abs(rms_db - (-20.0)) < 0.01
    silent = np.zeros(100, dtype=np.float32)
    assert np.array_equal(rms_normalize(silent), silent)


# ------------------------------------------------------------- Spark level


@pytest.fixture(scope="module")
def augmented(spark):
    from semantic_log_detector_spark.sources.synth import clips_table

    clips = clips_table(spark, 300, with_bytes=True)
    out = augment_clips(clips, seed=7).persist()
    yield clips, out
    out.unpersist()


def test_row_accounting_total(augmented):
    """n_input × n_specs rows, always — failures keep their rows."""
    clips, out = augmented
    assert out.count() == clips.count() * 3
    assert out.filter("NOT ok").count() > 0  # synth plants undecodables/fakes
    bad = out.filter("NOT ok")
    assert bad.filter(F.col("err").isNull()).count() == 0
    assert bad.filter(F.col("bytes").isNotNull()).count() == 0


def test_augmented_payloads_decode_and_scale(augmented, spark):
    """Every ok payload decodes through the engine's own path; speed specs
    scale duration by exactly 1/factor (to rounding); noise spec preserves
    length. Validated via decode, not trust."""
    _, out = augmented
    rows = out.filter("ok").select(
        "aug", "bytes", "sr_hz", "dur_ms", "src_clip_id").collect()
    assert rows
    from semantic_log_detector_spark.functions.audio import decode_clip

    for r in rows[:50]:
        pcm, sr = decode_clip(r["bytes"], "pcm_s16le")
        assert sr == r["sr_hz"]
        assert abs(len(pcm) * 1000.0 / sr - r["dur_ms"]) <= 1.0


def test_deterministic_across_partitioning(spark):
    from semantic_log_detector_spark.sources.synth import clips_table

    clips = clips_table(spark, 120, with_bytes=True)
    a = augment_clips(clips.repartition(1), seed=3)
    b = augment_clips(clips.repartition(8), seed=3)
    cols = ["clip_id", "aug", "ok", "err", "sr_hz", "dur_ms",
            F.md5(F.coalesce(F.hex("bytes"), F.lit(""))).alias("payload_md5")]
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0


def test_augmented_corpus_passes_payload_rules(spark):
    """The augmented corpus is VALID by the engine's own payload rules: a
    clean input expanded with the default specs produces zero R060/R063/
    R064/R065 violations (noise at 20 dB SNR is far above the silence
    gate, far below clipping)."""
    import pandas as pd

    from semantic_log_detector_spark.checks.base import RunContext
    from semantic_log_detector_spark.checks.drift import decode_stats
    from semantic_log_detector_spark.functions.audio import encode_wav

    pdf = pd.DataFrame({
        "clip_id": [f"c{i}" for i in range(20)],
        "bytes": [encode_wav(_tone(f=200 + 50 * i, seed=i), 16000)
                  for i in range(20)],
        "codec": ["pcm_s16le"] * 20,
        "transcript": ["hello world"] * 20,
    })
    clips = spark.createDataFrame(pdf)
    out = augment_clips(clips, seed=1).filter("ok").select(
        "clip_id", "bytes", "codec", "sr_hz", "dur_ms",
        F.lit(0).alias("part_id"),
    )
    stats = decode_stats(out, RunContext(run_id="aug", num_parts=4))
    viols = stats.filter("kind = 'v'").collect()
    assert viols == []


def test_speed_spec_shifts_duration_exactly(spark):
    """Per-spec metadata contract: dur_ms(sp0.9) ≈ dur/0.9, dur_ms(sp1.1)
    ≈ dur/1.1, dur_ms(n20db) == dur — joined per source clip."""
    import pandas as pd

    from semantic_log_detector_spark.functions.audio import encode_wav

    pdf = pd.DataFrame({
        "clip_id": ["a", "b"],
        "bytes": [encode_wav(_tone(dur_s=2.0), 16000),
                  encode_wav(_tone(dur_s=0.5), 16000)],
        "codec": ["pcm_s16le"] * 2,
    })
    out = {(r["src_clip_id"], r["aug"]): r["dur_ms"]
           for r in augment_clips(spark.createDataFrame(pdf),
                                  passthrough=()).collect()}
    assert out[("a", "n20db")] == 2000
    assert abs(out[("a", "sp0.9")] - 2000 / 0.9) <= 1
    assert abs(out[("a", "sp1.1")] - 2000 / 1.1) <= 1
    assert out[("b", "n20db")] == 500


def test_resample_kind_canonicalizes_rate(spark):
    """The resample augmentation re-rates every clip to the target and
    preserves wall-clock duration — the mixed-rate → one-rate ingest."""
    import numpy as np

    from semantic_log_detector_spark.functions.audio import decode_clip, encode_wav
    from semantic_log_detector_spark.operators.augment import AugSpec, augment_clips

    rows = []
    for i, sr in enumerate((8000, 22050, 48000)):
        t = np.arange(sr) / sr  # exactly 1 s each
        pcm = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        rows.append((f"c{i}", encode_wav(pcm, sr), "pcm_s16le"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    out = augment_clips(
        df, specs=(AugSpec("r16k", "resample", {"target_hz": 16000}),)
    ).collect()
    assert all(r["ok"] and r["sr_hz"] == 16000 for r in out)
    for r in out:
        pcm, sr = decode_clip(bytes(r["bytes"]), "pcm_s16le")
        assert sr == 16000
        assert abs(len(pcm) / sr - 1.0) < 0.01
        assert abs(r["dur_ms"] - 1000) <= 10

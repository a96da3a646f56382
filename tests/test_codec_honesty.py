"""Codec fidelity: fake decodes are never silent (VERDICT round-1 item 4).

The container has no flac/opus/mp3 codec, so those labels route to a
deterministic fake (WAV parse) — the contract here is that the substitution
is (a) impossible for real compressed payloads (container magic refuses),
(b) counted and reported per partition in lenient mode, and (c) a violation
in strict mode. Reference decode seam: src/detection/pipeline.py:65-68.
"""

import numpy as np
import pytest

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.drift import R_CODEC, drift_check
from semantic_log_detector_spark.functions.audio import (
    DECODERS,
    decode_clip_ex,
    decode_wav,
    encode_wav,
    register_decoder,
)
from semantic_log_detector_spark.sources.synth import clips_table


def _wav(sr=16000, ms=200):
    t = np.arange(int(sr * ms / 1000)) / sr
    return encode_wav((0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)


def test_decode_clip_ex_flags_fake():
    buf = _wav()
    _, _, fake = decode_clip_ex(buf, "pcm_s16le")
    assert fake is False
    _, _, fake = decode_clip_ex(buf, "flac")  # flac-labeled WAV → fake path
    assert fake is True


def test_real_compressed_payload_refused_not_misparsed():
    # a payload with actual FLAC magic must raise (→ decode violation), not
    # be silently WAV-parsed by the fake path
    flacish = b"fLaC" + b"\x00" * 100
    with pytest.raises(NotImplementedError, match="real 'flac'"):
        decode_clip_ex(flacish, "flac")
    oggish = b"OggS" + b"\x00" * 100
    with pytest.raises(NotImplementedError, match="real 'opus'"):
        decode_clip_ex(oggish, "opus")
    with pytest.raises(ValueError, match="unknown codec"):
        decode_clip_ex(_wav(), "vorbis??")


def test_registered_decoder_clears_fake_flag():
    register_decoder("flac", decode_wav)
    try:
        _, _, fake = decode_clip_ex(_wav(), "flac")
        assert fake is False
    finally:
        DECODERS.pop("flac", None)


def test_lenient_mode_reports_fake_counts(spark):
    clips = clips_table(spark, 2000)
    ctx = RunContext(run_id="codec_lenient", num_parts=64)
    res = drift_check(clips, ctx)
    try:
        r062 = res.verdicts.filter(f"rule_id = '{R_CODEC}'").collect()
        assert len(r062) == 64  # every partition gets an explicit verdict
        assert all(r["passed"] for r in r062)
        total_fake = sum(
            int(r["observed"].split("=")[1]) for r in r062 if r["observed"]
        )
        # synth labels ~20% of clips flac/opus/mp3 (all WAV-framed) → fakes
        assert 200 <= total_fake <= 600
    finally:
        res.release()


def test_strict_mode_turns_fakes_into_violations(spark):
    clips = clips_table(spark, 1000)
    ctx = RunContext(run_id="codec_strict", num_parts=64)
    res = drift_check(clips, ctx, strict_codecs=True)
    try:
        viols = res.violations.filter(f"rule_id = '{R_CODEC}'").collect()
        assert 100 <= len(viols) <= 300
        assert all(v["clip_id"] is not None for v in viols)
        failed = res.verdicts.filter(
            f"rule_id = '{R_CODEC}' AND NOT passed"
        ).count()
        assert failed > 0
    finally:
        res.release()

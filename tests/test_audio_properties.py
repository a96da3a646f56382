"""Property-based tests (hypothesis) for the audio DSP layer.

The reference has no property testing at all (SURVEY.md §5); the codec +
feature path is where this engine most needs it — every clip in a 10^12-row
table passes through these functions inside Arrow UDFs, so invariants must
hold for arbitrary inputs, not just the synthetic fixtures. Pure numpy, no
Spark: fast enough for hypothesis's example counts.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_log_detector_spark.functions.audio import (
    decode_wav,
    encode_wav,
    mel_filterbank,
    mfcc,
    snr_db,
)

_sr = st.sampled_from([8_000, 16_000, 22_050, 44_100])


@st.composite
def _pcm(draw, min_len=16, max_len=4096):
    n = draw(st.integers(min_len, max_len))
    seed = draw(st.integers(0, 2**32 - 1))
    amp = draw(st.floats(0.01, 1.0))
    rng = np.random.default_rng(seed)
    return (amp * rng.uniform(-1.0, 1.0, n)).astype(np.float32)


@settings(max_examples=50, deadline=None)
@given(pcm=_pcm(), sr=_sr)
def test_wav_roundtrip_preserves_signal(pcm, sr):
    out, sr2 = decode_wav(encode_wav(pcm, sr))
    assert sr2 == sr
    assert out.shape == pcm.shape
    # 16-bit quantization: every sample within one LSB, SNR high for
    # non-degenerate signals
    assert np.max(np.abs(out - pcm)) <= 1.5 / 32767.0
    if float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) > 1e-3:
        assert snr_db(pcm, out) >= 30.0


@settings(max_examples=30, deadline=None)
@given(pcm=_pcm(), sr=_sr, cut=st.integers(1, 43))
def test_truncated_wav_always_raises_not_misparses(pcm, sr, cut):
    buf = encode_wav(pcm, sr)
    with pytest.raises(ValueError):
        decode_wav(buf[:cut])


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_arbitrary_bytes_never_crash_the_decoder(junk):
    """decode_wav must either parse or raise ValueError — never segfault,
    never return garbage silently for non-RIFF bytes."""
    if junk[:4] == b"RIFF":  # hypothesis won't realistically forge a full WAV
        return
    with pytest.raises(ValueError):
        decode_wav(junk)


@settings(max_examples=25, deadline=None)
@given(pcm=_pcm(min_len=512, max_len=4096), sr=_sr)
def test_mfcc_finite_and_fixed_width(pcm, sr):
    m = mfcc(pcm, sr)
    assert m.shape[-1] == 13
    assert np.isfinite(m).all()


@settings(max_examples=20, deadline=None)
@given(sr=_sr, n_fft=st.sampled_from([256, 512, 1024]),
       n_mels=st.integers(8, 40))
def test_mel_filterbank_shape_and_coverage(sr, n_fft, n_mels):
    fb = mel_filterbank(sr, n_fft, n_mels)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all() and np.isfinite(fb).all()
    # every filter has some mass — no dead mel band at any rate/size combo
    assert (fb.sum(axis=1) > 0).all()


@st.composite
def _bursty_pcm(draw, min_len=256, max_len=48_000):
    """Signals with silence/burst structure — the case VAD disagreement
    would show up in (uniform noise is trivially all-speech)."""
    n = draw(st.integers(min_len, max_len))
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    x = np.zeros(n, dtype=np.float64)
    for _ in range(draw(st.integers(0, 4))):
        a = draw(st.integers(0, max(n - 2, 1)))
        b = draw(st.integers(a + 1, n))
        x[a:b] = draw(st.floats(0.001, 0.9)) * rng.standard_normal(b - a)
    return x


@settings(max_examples=40, deadline=None)
@given(pcm=_bursty_pcm(), sr=_sr)
def test_cumsum_vad_matches_matrix_kernel(pcm, sr):
    """speech_ms_fast (O(n) cumsum, rides the suite decode pass) must
    agree with the segmentation kernel (_frame_rms_db window matrix +
    _segments_from_mask) on ANY signal — same framing, same threshold,
    same hangover merge. Tolerance one hop: the only legitimate
    difference is float associativity flipping a frame that sits exactly
    ON the threshold."""
    from semantic_log_detector_spark.operators.segment import (
        DEFAULT_THRESHOLD_DBFS,
        FRAME_MS,
        HOP_MS,
        _frame_rms_db,
        _segments_from_mask,
        speech_ms_fast,
    )

    db = _frame_rms_db(pcm, sr, FRAME_MS, HOP_MS)
    segs = _segments_from_mask(db >= DEFAULT_THRESHOLD_DBFS,
                               HOP_MS / 1000.0, FRAME_MS / 1000.0, 0.1, 0.15)
    dur = len(pcm) / sr
    want = 1000.0 * sum(min(t1, dur) - t0 for t0, t1 in segs)
    got = speech_ms_fast(pcm, sr)
    assert abs(got - want) <= HOP_MS + 1e-6

"""Integrated loudness (LUFS) — ITU-R BS.1770-style K-weighted gated measure.

Every serious audio-corpus pipeline normalizes or gates on integrated
loudness (broadcast/ASR corpora target ≈ −23 LUFS; wildly-off clips are
either mastering accidents or the wrong content). This module measures it
the standard way — K-weighting filter, 400 ms gating blocks at 75%
overlap, −70 LUFS absolute gate, −10 LU relative gate — in pure numpy so
it runs inside the engine's Arrow decode pass. (The reference has no
loudness notion; this extends the payload-quality axis of its per-field
statistical profile, src/detector/statistics.py:1-60, to the standard
broadcast loudness measure.)

Implementation note: the two BS.1770 biquads (high-shelf "head" stage +
RLB high-pass) are applied in the FREQUENCY domain — one rfft/irfft of
the whole clip with the cascaded biquad response evaluated on the rfft
grid — instead of a sequential time-domain IIR, which is a per-sample
Python loop without scipy. For an energy measure this is the right trade:
the magnitude response is exact (the biquad transfer function evaluated
at e^{-jω}), and the only difference from the causal filter is circular
edge leakage at the clip boundaries, far below the gating granularity.
The filter parameterization (fc/Q/gain per stage) is the published
sample-rate-independent form of the 48 kHz reference coefficients, mapped
through the RBJ cookbook bilinear design at the clip's own rate — no
resampling needed.

Known-answer anchor (tested): a 0 dBFS 997 Hz sine reads −3.01 LUFS
(BS.1770's own calibration statement); gain linearity holds exactly.
"""

from __future__ import annotations

import numpy as np

# BS.1770 K-weighting: the standard publishes exact digital biquad
# coefficients at 48 kHz (stage 1 "head" high-shelf, stage 2 RLB
# high-pass). Other sample rates are handled the canonical way: inverse
# bilinear transform recovers the analog prototype from the 48 kHz
# coefficients, a forward bilinear at the clip's own rate re-derives the
# digital filter — exact reproduction of the spec at 48 kHz, the standard
# warped mapping elsewhere (no resampling of the audio needed).
_SHELF_B48 = np.array([1.53512485958697, -2.69169618940638, 1.19839281085285])
_SHELF_A48 = np.array([1.0, -1.69065929318241, 0.73248077421585])
_HP_B48 = np.array([1.0, -2.0, 1.0])
_HP_A48 = np.array([1.0, -1.99004745483398, 0.99007225036621])
_FS_REF = 48000.0

_BLOCK_S = 0.400    # gating block length
_OVERLAP = 0.75     # 75% overlap → 100 ms hop
_ABS_GATE = -70.0   # LUFS
_REL_GATE = -10.0   # LU below the abs-gated mean
_OFFSET = -0.691    # the K-weighting 997 Hz compensation constant


def _inv_bilinear(b: np.ndarray, a: np.ndarray, fs: float) -> tuple[np.ndarray, np.ndarray]:
    """Digital biquad at ``fs`` → analog prototype (s-domain) coefficients
    [s², s, 1] via the inverse bilinear substitution z⁻¹=(1−s/K)/(1+s/K)."""
    K = 2.0 * fs
    to_s = lambda c: np.array([
        (c[0] - c[1] + c[2]) / (K * K),   # s²
        2.0 * (c[0] - c[2]) / K,          # s
        c[0] + c[1] + c[2],               # 1
    ])
    return to_s(b), to_s(a)


def _fwd_bilinear(bs: np.ndarray, as_: np.ndarray, fs: float) -> tuple[np.ndarray, np.ndarray]:
    """Analog biquad [s², s, 1] → digital biquad at ``fs`` via
    s = K(1−z⁻¹)/(1+z⁻¹)."""
    K = 2.0 * fs
    to_z = lambda c: np.array([
        c[0] * K * K + c[1] * K + c[2],
        -2.0 * c[0] * K * K + 2.0 * c[2],
        c[0] * K * K - c[1] * K + c[2],
    ])
    return to_z(bs), to_z(as_)


def _rerate(b48: np.ndarray, a48: np.ndarray, sr: float) -> tuple[np.ndarray, np.ndarray]:
    if sr == _FS_REF:
        return b48, a48
    bs, as_ = _inv_bilinear(b48, a48, _FS_REF)
    return _fwd_bilinear(bs, as_, sr)


def _biquad_highshelf(sr: float) -> tuple[np.ndarray, np.ndarray]:
    """(b, a) for the BS.1770 stage-1 shelf at sample rate ``sr``."""
    return _rerate(_SHELF_B48, _SHELF_A48, sr)


def _biquad_highpass(sr: float) -> tuple[np.ndarray, np.ndarray]:
    """(b, a) for the BS.1770 stage-2 RLB high-pass at ``sr``."""
    return _rerate(_HP_B48, _HP_A48, sr)


def k_weight_response(freqs: np.ndarray, sr: float) -> np.ndarray:
    """Complex K-weighting response H(f) = H_shelf(f)·H_hp(f) on ``freqs``
    (Hz) for sample rate ``sr`` — the cascaded biquad transfer functions
    evaluated at z = e^{jω}."""
    w = 2.0 * np.pi * freqs / sr
    z1 = np.exp(-1j * w)
    z2 = z1 * z1
    h = np.ones_like(z1)
    for b, a in (_biquad_highshelf(sr), _biquad_highpass(sr)):
        h = h * (b[0] + b[1] * z1 + b[2] * z2) / (a[0] + a[1] * z1 + a[2] * z2)
    return h


def k_weight(pcm: np.ndarray, sr: float) -> np.ndarray:
    """K-weighted signal via frequency-domain application of the cascade
    (one rfft + irfft; circular edge leakage documented above)."""
    x = np.asarray(pcm, dtype=np.float64)
    if len(x) == 0:
        return x
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
    return np.fft.irfft(spec * k_weight_response(freqs, sr), n=len(x))


def integrated_lufs(pcm: np.ndarray, sr: int) -> float | None:
    """BS.1770 gated integrated loudness of a mono clip, in LUFS.

    Returns None when nothing survives the −70 LUFS absolute gate (digital
    silence / near-silence has no defined loudness) or the clip is shorter
    than one 400 ms gating block — short clips are padded to one block
    (the standard measures what is there; an 80 ms beep still has a level).
    """
    x = np.asarray(pcm, dtype=np.float64)
    if len(x) == 0 or sr <= 0:
        return None
    y = k_weight(x, float(sr))
    blk = max(int(round(_BLOCK_S * sr)), 1)
    hop = max(int(round(blk * (1.0 - _OVERLAP))), 1)
    if len(y) < blk:
        y = np.pad(y, (0, blk - len(y)))
    n_blocks = 1 + (len(y) - blk) // hop
    idx = (np.arange(blk)[None, :] + hop * np.arange(n_blocks)[:, None])
    ms = np.mean(y[idx] ** 2, axis=1)  # per-block mean square
    with np.errstate(divide="ignore"):
        lk = _OFFSET + 10.0 * np.log10(ms + 1e-30)
    abs_pass = lk > _ABS_GATE
    if not abs_pass.any():
        return None
    rel_thresh = (_OFFSET + 10.0 * np.log10(ms[abs_pass].mean() + 1e-30)
                  + _REL_GATE)
    gated = abs_pass & (lk > rel_thresh)
    if not gated.any():
        return None
    return float(_OFFSET + 10.0 * np.log10(ms[gated].mean() + 1e-30))


def lufs_gain_db(pcm: np.ndarray, sr: int, target_lufs: float) -> float:
    """Gain (dB) that moves the clip's integrated loudness to ``target_lufs``
    (loudness is gain-linear: +g dB of gain is +g LU of loudness). 0.0 for
    clips with no measurable loudness — silence is left untouched, same
    policy as rms_normalize."""
    cur = integrated_lufs(pcm, sr)
    if cur is None:
        return 0.0
    return float(target_lufs - cur)

"""G.711 µ-law/A-law and IMA ADPCM: real codecs, honest fidelity claims.

Fidelity contract per codec class:
- mulaw/alaw (log PCM): decode is TABLE-EXACT vs the classic Sun g711.c
  reference values; round-trip SNR ≥ 30 dB on synth-shaped signals.
- adpcm_ima (4-bit slope quantizer): round-trip is codec-inherently lossy
  (~15–29 dB on these signals) so the invariant is DECODE PARITY — the
  block-vectorized numpy decoder must be bit-exact against the scalar
  straight-from-the-spec reference decoder on the same bytes.
"""

import numpy as np
import pytest

from semantic_log_detector_spark.functions.adpcm import (
    decode_adpcm,
    decode_adpcm_scalar,
    encode_adpcm,
)
from semantic_log_detector_spark.functions.g711 import (
    alaw_decode_u8,
    alaw_encode_i16,
    decode_alaw,
    decode_mulaw,
    encode_alaw,
    encode_mulaw,
    mulaw_decode_u8,
    mulaw_encode_i16,
)


def _snr_db(orig: np.ndarray, dec: np.ndarray) -> float:
    n = min(len(orig), len(dec))
    a, b = orig[:n].astype(np.float64), dec[:n].astype(np.float64)
    return 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-12))


def _sig(sr: int, freq: float, seed: int = 3, dur_s: float = 0.7) -> np.ndarray:
    t = np.arange(int(sr * dur_s)) / sr
    rng = np.random.Generator(np.random.Philox(key=seed))
    return (0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_g711_decode_is_table_exact():
    # Sun g711.c reference values — the public-domain ground truth
    assert mulaw_decode_u8(np.array([0x00]))[0] == -32124
    assert mulaw_decode_u8(np.array([0xFF]))[0] == 0
    assert mulaw_decode_u8(np.array([0x7F]))[0] == 0  # positive zero code
    assert alaw_decode_u8(np.array([0x55]))[0] == -8
    assert alaw_decode_u8(np.array([0xD5]))[0] == 8
    assert alaw_decode_u8(np.array([0x2A]))[0] == -32256


def test_g711_encode_decode_consistent_over_full_i16_range():
    # every int16 value must round-trip into its own quantization cell:
    # decode(encode(decode(code))) == decode(code) (decode-level
    # idempotence — byte-level would fail on µ-law's ±0 alias: 0x7F and
    # 0xFF both legitimately decode to 0)
    x = np.arange(-32768, 32768, dtype=np.int16)
    for enc, dec in [
        (mulaw_encode_i16, mulaw_decode_u8),
        (alaw_encode_i16, alaw_decode_u8),
    ]:
        mid = dec(enc(x))
        assert np.array_equal(dec(enc(mid)), mid)
        # and the cell error is bounded by the segment width (log PCM)
        assert int(np.abs(x.astype(np.int32) - mid.astype(np.int32)).max()) <= 1024


@pytest.mark.parametrize("sr,freq", [(8000, 300), (16000, 1000), (48000, 2900)])
def test_g711_roundtrip_snr_above_30db(sr, freq):
    pcm = _sig(sr, freq)
    for enc, dec in [(encode_mulaw, decode_mulaw), (encode_alaw, decode_alaw)]:
        buf = enc(pcm, sr)
        out, sr2 = dec(buf)
        assert sr2 == sr and len(out) == len(pcm)
        assert _snr_db(pcm, out) >= 30.0
        # real 2:1 compression vs 16-bit PCM
        assert len(buf) < 2 * len(pcm) * 0.6


@pytest.mark.parametrize("sr,freq", [(8000, 300), (16000, 1000), (48000, 2900)])
def test_adpcm_vectorized_decode_bit_exact_vs_scalar_reference(sr, freq):
    pcm = _sig(sr, freq)
    buf = encode_adpcm(pcm, sr)
    vec, sr_v = decode_adpcm(buf)
    ref, sr_s = decode_adpcm_scalar(buf)
    assert sr_v == sr_s == sr
    assert np.array_equal(vec, ref)
    assert len(vec) == len(pcm)  # fact chunk honors the true sample count
    # real ~4:1 compression
    assert len(buf) < 2 * len(pcm) * 0.3
    # codec-inherent fidelity floor (honest claim, not 30 dB)
    assert _snr_db(pcm, vec) >= 14.0


def test_adpcm_batch_decode_matches_per_clip_and_isolates_errors():
    # the cross-row batched decoder (one concatenated block matrix per
    # batch) must be bit-exact vs per-clip decode, and a bad payload must
    # surface as ITS OWN exception without failing the batch
    from semantic_log_detector_spark.functions.adpcm import decode_adpcm_batch

    clips = [
        _sig(8000, 300, seed=11, dur_s=0.3),
        _sig(16000, 1000, seed=12, dur_s=1.1),
        _sig(48000, 2900, seed=13, dur_s=0.05),
    ]
    bufs = [encode_adpcm(p, sr) for p, sr in zip(clips, [8000, 16000, 48000])]
    bad = bufs[1][: len(bufs[1]) // 2]  # truncated
    results = decode_adpcm_batch([bufs[0], bad, bufs[1], None, bufs[2]])
    assert isinstance(results[1], Exception)
    assert isinstance(results[3], Exception)
    for ri, bi in [(0, 0), (2, 1), (4, 2)]:
        pcm_b, sr_b = results[ri]
        pcm_s, sr_s = decode_adpcm(bufs[bi])
        assert sr_b == sr_s
        assert np.array_equal(pcm_b, pcm_s)


def test_adpcm_truncated_and_misaligned_payloads_raise():
    pcm = _sig(8000, 500)
    buf = encode_adpcm(pcm, 8000)
    with pytest.raises(ValueError):
        decode_adpcm(buf[: len(buf) // 2])
    with pytest.raises(ValueError):
        decode_adpcm(b"RIFF\x00\x00\x00\x00WAVEjunk")


def test_g711_truncated_payloads_raise():
    pcm = _sig(8000, 500)
    for enc, dec in [(encode_mulaw, decode_mulaw), (encode_alaw, decode_alaw)]:
        buf = enc(pcm, 8000)
        with pytest.raises(ValueError):
            dec(buf[: len(buf) // 2])
        with pytest.raises(ValueError):
            dec(b"\x00" * 10)


def test_codec_cross_labeling_is_refused_not_misparsed():
    # a 16-bit WAV mislabeled mulaw must raise (tag 1 ≠ 7) — never a silent
    # wrong parse. A µ-law WAV mislabeled pcm_s16le is NOT a wrong parse:
    # the WAV container self-describes via its fmt tag, so the round-5
    # layout-complete decode_wav follows the container and produces the
    # same samples the dedicated mulaw decoder does.
    from semantic_log_detector_spark.functions.audio import decode_clip_ex, encode_wav

    pcm = _sig(8000, 500)
    mu = encode_mulaw(pcm, 8000)
    via_label, _ = decode_mulaw(mu)
    via_container, sr, fake = decode_clip_ex(mu, "pcm_s16le")
    assert sr == 8000 and not fake
    assert np.array_equal(via_label, via_container)
    wav = encode_wav(pcm, 8000)
    with pytest.raises(ValueError):
        decode_clip_ex(wav, "mulaw")
    with pytest.raises(ValueError):
        decode_clip_ex(wav, "adpcm_ima")
    # correctly-labeled payloads decode for REAL (fake flag False)
    for codec, enc in [
        ("mulaw", encode_mulaw),
        ("alaw", encode_alaw),
        ("adpcm_ima", encode_adpcm),
    ]:
        out, sr, fake = decode_clip_ex(enc(pcm, 8000), codec)
        assert sr == 8000 and not fake and len(out) == len(pcm)


def test_synth_emits_real_g711_and_adpcm_streams(spark):
    from semantic_log_detector_spark.sources.synth import clips_table

    rows = (
        clips_table(spark, 1200)
        .filter(
            "codec IN ('mulaw','alaw','adpcm_ima') AND length(bytes) > 100"
            " AND sr_hz IS NOT NULL AND sr_hz BETWEEN 1 AND 96000"
        )
        .select("codec", "bytes", "sr_hz")
        .limit(30)
        .collect()
    )
    assert len(rows) >= 10, "synth should label ~25% of clips mulaw/alaw/adpcm"
    seen = set()
    for r in rows:
        buf = bytes(r["bytes"])
        from semantic_log_detector_spark.functions.audio import decode_clip_ex

        pcm, sr, fake = decode_clip_ex(buf, r["codec"])
        assert not fake and sr == r["sr_hz"] and len(pcm) >= 16
        seen.add(r["codec"])
        # container carries the right fmt tag (not a 16-bit PCM WAV)
        import struct

        tag = struct.unpack_from("<H", buf, 20)[0]
        assert tag == {"mulaw": 7, "alaw": 6, "adpcm_ima": 0x11}[r["codec"]]
    assert len(seen) >= 2

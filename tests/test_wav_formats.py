"""WAV layout completion: 8/24/32-bit PCM, IEEE float, G.711-in-WAV, and
WAVE_FORMAT_EXTENSIBLE — the layouts a real corpus ships beyond 16-bit PCM.

The 16-bit mono path must stay bit-for-bit the historical fast path (every
prior round's fingerprints/features depend on it), so the anchor tests here
compare the new containers against `encode_wav` output rather than floats.
Reference decode seam: SURVEY.md §0.1/X5 (src/detection/pipeline.py:65-68).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from semantic_log_detector_spark.functions.audio import (
    decode_clip_ex,
    decode_wav,
    encode_wav,
    encode_wav_ex,
)
from semantic_log_detector_spark.functions.g711 import decode_mulaw, encode_mulaw

SR = 16000


def _sig(n=SR, seed=7, amp=0.5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * 440 * t) + 0.01 * rng.standard_normal(n)).astype(
        np.float32
    )


def _snr(ref, got):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    return 10 * np.log10(np.sum(ref**2) / max(np.sum((ref - got) ** 2), 1e-30))


# ------------------------------------------------------------------ layouts


def test_extensible_16bit_is_bit_identical_to_plain():
    x = _sig()
    plain, sr0 = decode_wav(encode_wav(x, SR))
    ext, sr1 = decode_wav(encode_wav_ex(x, SR, 16, "pcm", extensible=True))
    assert sr0 == sr1 == SR
    assert np.array_equal(plain, ext)


@pytest.mark.parametrize(
    "bits,fmt,min_snr",
    [
        (8, "pcm", 30.0),
        (24, "pcm", 100.0),
        (32, "pcm", 120.0),
        (32, "float", 200.0),
        (64, "float", 200.0),
        (8, "alaw", 30.0),
        (8, "mulaw", 30.0),
    ],
)
@pytest.mark.parametrize("extensible", [False, True])
def test_layout_roundtrip_snr(bits, fmt, min_snr, extensible):
    x = _sig()
    pcm, sr = decode_wav(encode_wav_ex(x, SR, bits, fmt, extensible=extensible))
    assert sr == SR and len(pcm) == len(x) and pcm.dtype == np.float32
    assert _snr(x, pcm) >= min_snr


def test_float32_roundtrip_is_exact():
    x = _sig()
    pcm, _ = decode_wav(encode_wav_ex(x, SR, 32, "float"))
    assert np.array_equal(pcm, x)


@pytest.mark.parametrize("bits,fmt", [(16, "pcm"), (24, "pcm"), (32, "float")])
def test_identical_channel_stereo_twin_bit_equal(bits, fmt):
    x = _sig()
    mono, _ = decode_wav(encode_wav_ex(x, SR, bits, fmt))
    stereo, _ = decode_wav(encode_wav_ex(np.stack([x, x], axis=1), SR, bits, fmt))
    assert np.array_equal(mono, stereo)


def test_multichannel_downmix_is_mean():
    x = _sig()
    quad = np.stack([x, -x, x, -x], axis=1)  # mean is exactly 0
    pcm, _ = decode_wav(encode_wav_ex(quad, SR, 16))
    assert np.max(np.abs(pcm)) == 0.0
    # distinct channels: mean of the decoded per-channel signals
    two = np.stack([x, np.zeros_like(x)], axis=1)
    half, _ = decode_wav(encode_wav_ex(two, SR, 16))
    full, _ = decode_wav(encode_wav_ex(x, SR, 16))
    assert _snr(full / 2.0, half) > 80.0


def test_g711_in_wav_matches_dedicated_decoder():
    x = _sig()
    via_wav, _ = decode_wav(encode_wav_ex(x, SR, 8, "mulaw"))
    via_g711, _ = decode_mulaw(encode_mulaw(x, SR))
    assert np.array_equal(via_wav, via_g711)


def test_decode_clip_routes_new_layouts():
    x = _sig()
    pcm, sr, fake = decode_clip_ex(
        encode_wav_ex(x, SR, 24, "pcm", extensible=True), "pcm_s16le"
    )
    assert sr == SR and not fake and _snr(x, pcm) > 100.0


# ----------------------------------------------------------------- refusals


def test_nonstandard_guid_refuses():
    buf = bytearray(encode_wav_ex(_sig(200), SR, 16, "pcm", extensible=True))
    # GUID tail starts 24 bytes into the fmt body; fmt body starts at 12+8
    guid_off = 12 + 8 + 24
    buf[guid_off + 10] ^= 0xFF
    with pytest.raises(ValueError, match="subformat GUID"):
        decode_wav(bytes(buf))


def test_padded_valid_bits_refuses():
    buf = bytearray(encode_wav_ex(_sig(200), SR, 24, "pcm", extensible=True))
    valid_off = 12 + 8 + 18
    struct.pack_into("<H", buf, valid_off, 20)  # claims 20 of 24 bits valid
    with pytest.raises(ValueError, match="valid"):
        decode_wav(bytes(buf))


def test_unsupported_tag_refuses():
    buf = bytearray(encode_wav(_sig(200), SR))
    struct.pack_into("<H", buf, 12 + 8, 2)  # WAVE_FORMAT_ADPCM
    with pytest.raises(ValueError, match="unsupported WAV layout"):
        decode_wav(bytes(buf))


def test_24bit_misaligned_data_refuses():
    buf = encode_wav_ex(_sig(200), SR, 24)
    # chop one byte off the data chunk and fix the declared size
    body = bytearray(buf[:-1] if len(buf) % 2 else buf)
    # find the data chunk to patch its size
    off = 12
    while off + 8 <= len(body):
        cid, csize = struct.unpack_from("<4sI", body, off)
        if cid == b"data":
            struct.pack_into("<I", body, off + 4, csize - 1)
            del body[off + 8 + csize - 1]
            break
        off += 8 + csize + (csize & 1)
    with pytest.raises(ValueError, match="multiple of 3"):
        decode_wav(bytes(body))


def test_short_fmt_chunk_raises_valueerror():
    # fmt chunk DECLARING csize=8: the buffer is long enough (later data
    # chunk bytes) but the sliced fmt body is short — must keep the
    # ValueError contract, not leak struct.error
    import struct

    fmt_body = struct.pack("<HHI", 1, 1, 16000)  # 8 bytes only
    data = b"\x00\x00" * 8
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(data))
               + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
               + b"data" + struct.pack("<I", len(data)) + data)
    with pytest.raises(ValueError, match="fmt chunk too short"):
        decode_wav(payload)

"""Full FLAC decoder coverage: bit-packed Rice residuals, FIXED + LPC
prediction, wasted bits, escape partitions, all stereo assignments,
multichannel, and byte-multiple sample depths.

Round-trip tests use encode_flac's round-5 `compression="fixed"` mode (a
real bit-packing encoder, so the streams are genuinely compressed); the
paths the encoder never emits (LPC, wasted bits, >2 channels, 24-bit) are
exercised with hand-assembled frames built from the module's own bit
helpers — the assembling code in this file is an independent composition,
the decode side is the production engine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from semantic_log_detector_spark.functions import flac as F

SR = 16000


def _sig(n, seed=42, amp=0.4):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (
        amp * np.sin(2 * np.pi * 220 * t)
        + amp / 2 * np.sin(2 * np.pi * 1333 * t)
        + 0.02 * rng.standard_normal(n)
    ).astype(np.float32)


# ------------------------------------------------------------- round-trips


@pytest.mark.parametrize("block_size", [256, 4096])
@pytest.mark.parametrize("partition_order", [0, 2])
def test_fixed_rice_mono_roundtrip(block_size, partition_order):
    x = _sig(3 * SR + 1234)
    ref, _ = F.decode_flac(F.encode_flac(x, SR))  # verbatim reference
    b = F.encode_flac(
        x, SR, block_size=block_size, compression="fixed",
        partition_order=partition_order,
    )
    got, sr = F.decode_flac(b)
    assert sr == SR and np.array_equal(got, ref)
    assert len(b) < 2 * len(x)  # genuinely compressed vs 16-bit raw


@pytest.mark.parametrize(
    "mode", ["independent", "left-side", "right-side", "mid-side"]
)
def test_stereo_assignment_roundtrip(mode):
    n = 2 * SR + 777
    st = np.stack([_sig(n, 1), _sig(n, 2, amp=0.3)], axis=1)
    ref, _ = F.decode_flac(F.encode_flac(st, SR))
    got, sr = F.decode_flac(F.encode_flac(st, SR, compression="fixed",
                                          stereo_mode=mode))
    assert sr == SR and np.array_equal(got, ref)


def test_rice_k0_path():
    # near-silence → residuals in {-1,0,1} → optimal k = 0
    rng = np.random.default_rng(3)
    x = (rng.integers(-1, 2, size=SR) / 32767.0).astype(np.float32)
    ref, _ = F.decode_flac(F.encode_flac(x, SR))
    got, _ = F.decode_flac(F.encode_flac(x, SR, compression="fixed"))
    assert np.array_equal(got, ref)


def test_escape_partition_path():
    # full-scale white noise: Rice at k=14 still loses to raw 17-bit escape
    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, SR).astype(np.float32)
    b = F.encode_flac(x, SR, compression="fixed")
    ref, _ = F.decode_flac(F.encode_flac(x, SR))
    got, _ = F.decode_flac(b)
    assert np.array_equal(got, ref)


def test_fixed_mode_identical_channels_match_mono_twin():
    x = _sig(SR)
    mono, _ = F.decode_flac(F.encode_flac(x, SR, compression="fixed"))
    twin, _ = F.decode_flac(
        F.encode_flac(np.stack([x, x], axis=1), SR, compression="fixed",
                      stereo_mode="mid-side")
    )
    assert np.array_equal(mono, twin)


# --------------------------------------------------- hand-assembled frames


def _streaminfo(sr, ch, bps, total, md5, min_bs, max_bs):
    packed = (sr << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    head = bytearray(b"fLaC")
    head += bytes([0x80, 0, 0, 34])
    head += min_bs.to_bytes(2, "big") + max_bs.to_bytes(2, "big")
    head += (0).to_bytes(3, "big") * 2
    head += packed.to_bytes(8, "big") + md5
    return bytes(head)


def _frame(bs, chan_code, size_code, subframe_bits, fi=0):
    hdr = bytearray([0xFF, 0xF8, (0b0111 << 4) | 0b0000,
                     (chan_code << 4) | (size_code << 1)])
    hdr += F._utf8_encode_num(fi)
    hdr += (bs - 1).to_bytes(2, "big")
    hdr.append(F.crc8(bytes(hdr)))
    bits = np.concatenate(subframe_bits)
    pad = (-len(bits)) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
    body = bytes(hdr) + np.packbits(bits).tobytes()
    return body + F.crc16(body).to_bytes(2, "big")


def _md5_stream(ints, bps):
    ints = np.asarray(ints)
    if bps == 16:
        return hashlib.md5(ints.astype("<i2").tobytes()).digest()
    if bps == 24:
        v = (ints.astype(np.int64).ravel() & 0xFFFFFF).astype(np.uint32)
        b3 = np.empty((v.size, 3), np.uint8)
        b3[:, 0] = v & 0xFF
        b3[:, 1] = (v >> 8) & 0xFF
        b3[:, 2] = (v >> 16) & 0xFF
        return hashlib.md5(b3.tobytes()).digest()
    raise AssertionError


def test_lpc_subframe_decode():
    # order-2 LPC, coeffs [3, -1], shift 1: x[i] = e[i] + ((3x[i-1] - x[i-2]) >> 1)
    rng = np.random.default_rng(11)
    bs, order, shift = 512, 2, 1
    coefs = [3, -1]
    e = rng.integers(-40, 41, size=bs - order)
    x = [100, 120]
    for v in e:
        x.append(int(v) + ((coefs[0] * x[-1] + coefs[1] * x[-2]) >> shift))
    x = np.array(x, np.int64)
    assert np.abs(x).max() < 32768  # stays 16-bit

    stype = 0b100000 | (order - 1)
    sub = [
        F._u_bits(stype << 1, 8),              # pad 0 | type | wasted 0
        F._sint_block_bits(x[:order], 16),     # warmup
        F._u_bits(4 - 1, 4),                   # precision-1 (4-bit coeffs)
        F._u_bits(shift & 0x1F, 5),            # shift (signed 5-bit, here +1)
        F._sint_block_bits(np.array(coefs), 4),
        F._u_bits(0, 2), F._u_bits(0, 4),      # residual: method 0, porder 0
        F._u_bits(6, 4),                       # rice param k=6
        F._rice_block_bits(F._zigzag(e), 6),
    ]
    buf = _streaminfo(SR, 1, 16, bs, _md5_stream(x, 16), bs, bs) + _frame(
        bs, 0b0000, 0b100, sub
    )
    got, sr = F.decode_flac(buf)
    assert sr == SR
    assert np.array_equal(got, x.astype(np.float32) / np.float32(32767.0))


def test_wasted_bits_decode():
    # samples all multiples of 4 → 2 wasted bits, stored at 14-bit width
    rng = np.random.default_rng(5)
    bs = 256
    x = rng.integers(-8000, 8000, size=bs) * 4
    sub = [
        F._u_bits((0b000001 << 1) | 1, 8),   # VERBATIM, wasted flag set
        F._u_bits(1, 2),                     # unary(wasted-1=1) = "01"
        F._sint_block_bits(x >> 2, 14),
    ]
    buf = _streaminfo(SR, 1, 16, bs, _md5_stream(x, 16), bs, bs) + _frame(
        bs, 0b0000, 0b100, sub
    )
    got, _ = F.decode_flac(buf)
    assert np.array_equal(got, x.astype(np.float32) / np.float32(32767.0))


def test_three_channel_independent_downmix():
    bs = 480
    chans = [np.full(bs, v, np.int64) for v in (300, 600, -300)]  # mean 200
    subs = []
    for c in chans:
        subs += F._encode_subframe_fixed(c, 16, 0)
    inter = np.stack(chans, axis=1)
    buf = _streaminfo(SR, 3, 16, bs, _md5_stream(inter, 16), bs, bs) + _frame(
        bs, 0b0010, 0b100, subs
    )
    got, _ = F.decode_flac(buf)
    expect = np.float32(200.0) / np.float32(32767.0)
    assert np.allclose(got, expect, atol=0) and len(got) == bs


def test_24bit_decode():
    rng = np.random.default_rng(8)
    bs = 320
    x = rng.integers(-(1 << 22), 1 << 22, size=bs)
    sub = [F._u_bits(0b000001 << 1, 8), F._sint_block_bits(x, 24)]
    buf = _streaminfo(SR, 1, 24, bs, _md5_stream(x, 24), bs, bs) + _frame(
        bs, 0b0000, 0b110, sub
    )
    got, _ = F.decode_flac(buf)
    assert np.array_equal(got, x.astype(np.float32) / np.float32(8388607.0))


# ----------------------------------------------------------------- refusals


def test_corrupt_rice_frame_fails_crc():
    x = _sig(SR)
    b = bytearray(F.encode_flac(x, SR, compression="fixed"))
    b[len(b) // 2] ^= 0x10
    with pytest.raises(ValueError):
        F.decode_flac(bytes(b))


def test_negative_lpc_shift_refused():
    bs = 64
    x = np.arange(bs, dtype=np.int64)
    stype = 0b100000  # LPC order 1
    sub = [
        F._u_bits(stype << 1, 8),
        F._sint_block_bits(x[:1], 16),
        F._u_bits(3, 4),
        F._u_bits((-1) & 0x1F, 5),  # shift = -1
        F._sint_block_bits(np.array([1]), 4),
        F._u_bits(0, 2), F._u_bits(0, 4), F._u_bits(0, 4),
        F._rice_block_bits(F._zigzag(np.zeros(bs - 1, np.int64)), 0),
    ]
    buf = _streaminfo(SR, 1, 16, bs, b"\x00" * 16, bs, bs) + _frame(
        bs, 0b0000, 0b100, sub
    )
    with pytest.raises(ValueError, match="negative LPC shift"):
        F.decode_flac(buf)


def test_nonbyte_sample_depth_refused():
    buf = _streaminfo(SR, 1, 12, 64, b"\x00" * 16, 64, 64)
    with pytest.raises(NotImplementedError, match="byte-multiple"):
        F.decode_flac(buf + b"\x00" * 8)


def test_sample_size_code_mismatch_refused():
    x = _sig(256)
    b = bytearray(F.encode_flac(x, SR, block_size=256))
    # frame header byte 3 carries the size code; flip 16-bit (100) to 24-bit (110)
    hdr_off = len(_streaminfo(SR, 1, 16, 0, b"\x00" * 16, 0, 0)) + 3
    b[hdr_off] = (b[hdr_off] & 0xF1) | (0b110 << 1)
    # re-fix CRC8 so the size check itself is what trips
    start = hdr_off - 3
    crc_off = start + 4 + 1 + 2  # sync..size | utf8(0) | bs-1 u16
    b[crc_off] = F.crc8(bytes(b[start:crc_off]))
    with pytest.raises(ValueError, match="sample-size"):
        F.decode_flac(bytes(b))


def test_single_byte_corruption_never_crashes_decoder():
    """Exhaustive single-byte fuzz over a bit-packed stream: every
    corrupted variant must either decode to finite PCM (flips the CRC/MD5
    machinery catches are a ValueError; flips in headers likewise) or
    raise the documented refusal types — never an IndexError/struct
    leak, never a hang.
    Ingest at corpus scale WILL see flipped bits; the decoder is the
    parser facing them."""
    rng = np.random.default_rng(3)
    pcm = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2048) / 8000)
           + 0.01 * rng.standard_normal(2048)).astype(np.float32)
    buf = bytearray(F.encode_flac(pcm, 8000, compression="fixed"))
    for pos in range(len(buf)):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytes(buf[:pos]) + bytes([buf[pos] ^ flip]) + bytes(buf[pos + 1:])
            try:
                out, sr = F.decode_flac(mut)
            except (ValueError, NotImplementedError):
                # ValueError = malformed-stream refusal; NotImplementedError
                # = the documented odd-bit-depth refusal (a flip landing in
                # STREAMINFO's bps field) — both clean, both fine
                continue
            assert sr > 0
            assert np.isfinite(np.asarray(out, dtype=np.float64)).all()

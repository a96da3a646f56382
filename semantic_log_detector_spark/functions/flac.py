"""Pure-numpy FLAC subset codec (real bytes, real decode — no external lib).

Closes the round-2 verdict's top item: the synthetic source's ``codec='flac'``
rows previously carried WAV-framed bytes routed through the honest fake-decode
path. This module implements a genuine FLAC encoder/decoder pair for the
subset the engine needs — mono + independent stereo (downmixed at decode
time), 16-bit, CONSTANT + VERBATIM subframes — per the public FLAC format
spec (https://xiph.org/flac/format.html / RFC 9639):

* stream  = ``fLaC`` magic + STREAMINFO metadata block (+ skipped others)
* frame   = header (sync, blocksize/sr/channel/bps codes, UTF-8 coded frame
  number, CRC-8) + one subframe per channel + CRC-16 over the whole frame
* STREAMINFO carries the MD5 of the unencoded little-endian sample stream,
  which the decoder verifies — so a flac→PCM roundtrip is checked three ways
  (CRC-8 per header, CRC-16 per frame, MD5 per stream).

VERBATIM subframes are bit-exact (no compression), so the decoded PCM equals
the WAV path's PCM sample-for-sample: the drift check's features and the
SNR≥30dB per-row invariant (BASELINE input_hint) are unchanged, but the
bytes on disk are now a stream any conforming FLAC decoder accepts.

Scale note: this runs inside Arrow-batched UDFs on the decode hot path, so
frame CRC-16 verification is vectorized — per-byte CRC has a sequential
dependency, but CRC with init=0 is GF(2)-linear, so each frame's CRC is
computed as a log2(L)-round tree combine (``crc(A||B) = shift_{|B|}(crc(A))
^ crc(B)``) with precomputed 64K-entry shift-by-2^k-bytes maps. All frames
of a clip are CRC'd in one (F × L) numpy pass; no per-byte Python loop.

Out-of-subset streams (>2 channels, side-channel stereo assignments,
non-16-bit, FIXED/LPC subframes, wasted bits) raise NotImplementedError
with the reason — never a wrong parse.
Reference decode seam being made real: src/detection/pipeline.py:65-68
(the reference's embedding encode), graft contract SURVEY.md §0.1/X5.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ------------------------------------------------------------------ CRC tables

_FLAC_CRC8_POLY = 0x07  # x^8 + x^2 + x + 1, init 0, MSB-first, no xorout
_FLAC_CRC16_POLY = 0x8005  # x^16 + x^15 + x^2 + 1, init 0, MSB-first


def _make_table(poly: int, width: int) -> np.ndarray:
    top, mask = 1 << (width - 1), (1 << width) - 1
    tab = np.zeros(256, dtype=np.uint16)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tab[b] = r
    return tab.astype(np.uint8 if width == 8 else np.uint16)


_CRC8_TABLE = _make_table(_FLAC_CRC8_POLY, 8)
_CRC16_TABLE = _make_table(_FLAC_CRC16_POLY, 16)


def crc8(data: bytes) -> int:
    """CRC-8/FLAC of a short buffer (frame headers: ≤ ~16 bytes)."""
    r = 0
    for b in data:
        r = int(_CRC8_TABLE[r ^ b])
    return r


# shift maps: _SHIFT_MAPS[k][s] = state s advanced by 2^k zero bytes.
# Built lazily; each is a 65536-entry uint16 lookup (shift-by-2^(k+1) is the
# self-composition of shift-by-2^k, so construction is k table chases).
_SHIFT_MAPS: list[np.ndarray] = []


def _shift_map(level: int) -> np.ndarray:
    while len(_SHIFT_MAPS) <= level:
        if not _SHIFT_MAPS:
            s = np.arange(65536, dtype=np.uint32)
            m8 = _CRC16_TABLE[s >> 8].astype(np.uint32) ^ ((s << 8) & 0xFFFF)
            _SHIFT_MAPS.append(m8.astype(np.uint16))
        else:
            prev = _SHIFT_MAPS[-1]
            _SHIFT_MAPS.append(prev[prev])
    return _SHIFT_MAPS[level]


def crc16_frames(frames: np.ndarray) -> np.ndarray:
    """CRC-16/FLAC of each row of a (F × L) uint8 array.

    Rows must be FRONT-padded with zeros to the common width L — leading
    zero bytes are identity under an init-0 CRC, so padding position is
    load-bearing. Tree combine: log2(L) rounds of vectorized table lookups.
    """
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    f, length = frames.shape
    if f == 0:
        return np.zeros(0, dtype=np.uint16)
    pow2 = 1 << max(length - 1, 0).bit_length() if length > 1 else 1
    if pow2 != length:
        frames = np.pad(frames, ((0, 0), (pow2 - length, 0)))
    crcs = _CRC16_TABLE[frames]
    level = 0
    while crcs.shape[1] > 1:
        m = _shift_map(level)
        crcs = m[crcs[:, 0::2]] ^ crcs[:, 1::2]
        level += 1
    return crcs[:, 0]


def crc16(data: bytes) -> int:
    """CRC-16/FLAC of one buffer (thin wrapper over the vectorized path)."""
    arr = np.frombuffer(data, dtype=np.uint8).reshape(1, -1)
    return int(crc16_frames(arr)[0]) if len(data) else 0


# ------------------------------------------------- FLAC "UTF-8" coded numbers


def _utf8_encode_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nb in range(2, 8):  # FLAC extends UTF-8 to 7 bytes / 36 bits
        head_bits = 7 - nb
        if n < (1 << (head_bits + 6 * (nb - 1))):
            out = bytearray(nb)
            out[0] = ((0xFF << (8 - nb)) & 0xFF) | (n >> (6 * (nb - 1)))
            for k in range(1, nb):
                out[k] = 0x80 | ((n >> (6 * (nb - 1 - k))) & 0x3F)
            return bytes(out)
    raise ValueError(f"number {n} too large for FLAC UTF-8 coding")


def _utf8_decode_num(buf: bytes, off: int) -> tuple[int, int]:
    if off >= len(buf):
        raise ValueError("truncated FLAC frame: coded number runs past end")
    b0 = buf[off]
    if b0 < 0x80:
        return b0, off + 1
    nlead = 0
    while nlead < 8 and (b0 << nlead) & 0x80:
        nlead += 1
    if nlead < 2 or nlead > 7:
        raise ValueError(f"invalid FLAC coded-number lead byte {b0:#04x}")
    if off + nlead > len(buf):
        raise ValueError("truncated FLAC frame: coded number runs past end")
    n = b0 & (0x7F >> nlead)
    for k in range(1, nlead):
        c = buf[off + k]
        if (c & 0xC0) != 0x80:
            raise ValueError("malformed FLAC coded-number continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n, off + nlead


# --------------------------------------------------------------------- encoder

_SR_CODE_TABLE = {
    88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
    16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
    44100: 0b1001, 48000: 0b1010, 96000: 0b1011,
}


def encode_flac(pcm: np.ndarray, sr_hz: int, block_size: int = 4096) -> bytes:
    """float32 [-1,1] → real FLAC bytes (16-bit, VERBATIM/CONSTANT).

    1-D input encodes mono (byte-identical to every prior round); a 2-D
    ``(n_samples, 2)`` array encodes independent-stereo frames (channel
    assignment 0b0001 — two 16-bit subframes per frame, byte-aligned, no
    side-channel bit packing). Same int16 quantization as ``encode_wav``
    so the decoded PCM is sample-identical to the WAV path. A block whose
    samples are all equal is emitted as a CONSTANT subframe (2 bytes
    instead of 2·bs) — the one compression opportunity the subset keeps.
    """
    if not 16 <= block_size <= 32768:
        raise ValueError("FLAC block size must be in [16, 32768]")
    arr = np.asarray(pcm, dtype=np.float64)
    if arr.ndim == 2 and arr.shape[1] == 1:
        arr = arr[:, 0]
    if arr.ndim not in (1, 2) or (arr.ndim == 2 and arr.shape[1] != 2):
        raise ValueError("encode_flac takes mono (1-D) or stereo (n, 2) input")
    channels = 1 if arr.ndim == 1 else 2
    ints = np.clip(arr * 32767.0, -32768, 32767).astype("<i2")
    n = len(ints)
    if n == 0:
        raise ValueError("cannot encode an empty clip")
    # STREAMINFO MD5 is over the interleaved little-endian sample stream;
    # C-order tobytes of an (n, 2) array is exactly that interleaving
    md5 = hashlib.md5(ints.tobytes()).digest()
    n_frames = (n + block_size - 1) // block_size
    last_bs = n - (n_frames - 1) * block_size
    min_bs = block_size if n_frames > 1 else last_bs
    max_bs = block_size if n >= block_size else last_bs

    # STREAMINFO: min/max blocksize u16×2, min/max framesize u24×2 (0=unknown),
    # then sr(20) | channels-1(3) | bps-1(5) | total_samples(36) packed big-endian.
    packed = (sr_hz << 44) | ((channels - 1) << 41) | (15 << 36) | n
    head = bytearray(b"fLaC")
    head += bytes([0x80, 0, 0, 34])  # last-metadata flag | type 0, length 34
    head += min_bs.to_bytes(2, "big") + max_bs.to_bytes(2, "big")
    head += (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
    head += packed.to_bytes(8, "big") + md5

    chan_code = 0b0000 if channels == 1 else 0b0001  # mono / independent LR

    def _subframe(blk: np.ndarray) -> bytes:
        if len(blk) and np.all(blk == blk[0]):
            return b"\x00" + int(blk[0]).to_bytes(2, "big", signed=True)
        return b"\x02" + blk.astype(">i2").tobytes()

    frames: list[bytes] = []
    for fi in range(n_frames):
        blk = ints[fi * block_size : (fi + 1) * block_size]
        bs = len(blk)
        # header: sync 0xFFF8 (fixed blocksize strategy), blocksize code 0b0111
        # (16-bit value at header end), sr code from table else 0b0000
        # (streaminfo), channel code above, sample size 0b100 (16-bit).
        sr_code = _SR_CODE_TABLE.get(sr_hz, 0b0000)
        hdr = bytearray(
            [0xFF, 0xF8, (0b0111 << 4) | sr_code, (chan_code << 4) | 0b100_0]
        )
        hdr += _utf8_encode_num(fi)
        hdr += (bs - 1).to_bytes(2, "big")
        hdr.append(crc8(bytes(hdr)))
        if channels == 1:
            sub = _subframe(blk)
        else:
            sub = _subframe(blk[:, 0]) + _subframe(blk[:, 1])
        frames.append(bytes(hdr) + sub)

    width = max(len(f) for f in frames)
    arr = np.zeros((n_frames, width), dtype=np.uint8)
    for fi, f in enumerate(frames):
        arr[fi, width - len(f) :] = np.frombuffer(f, dtype=np.uint8)
    crcs = crc16_frames(arr)
    body = b"".join(
        f + int(c).to_bytes(2, "big") for f, c in zip(frames, crcs)
    )
    return bytes(head) + body


# --------------------------------------------------------------------- decoder

_SR_DECODE_TABLE = {v: k for k, v in _SR_CODE_TABLE.items()}
_BLOCKSIZE_FIXED = {0b0001: 192}
_BLOCKSIZE_FIXED.update({c: 576 << (c - 2) for c in range(0b0010, 0b0110)})
_BLOCKSIZE_FIXED.update({c: 256 << (c - 8) for c in range(0b1000, 0b10000)})


def _parse_streaminfo(buf: bytes) -> tuple[int, int, int, int, bytes, int]:
    """→ (sr_hz, channels, bps, total_samples, md5, offset_after_metadata)."""
    if len(buf) < 4 or buf[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    off, seen_streaminfo = 4, False
    sr = ch = bps = total = 0
    md5 = b"\x00" * 16
    while True:
        if off + 4 > len(buf):
            raise ValueError("truncated FLAC metadata header")
        last = bool(buf[off] & 0x80)
        btype = buf[off] & 0x7F
        blen = int.from_bytes(buf[off + 1 : off + 4], "big")
        body = off + 4
        if body + blen > len(buf):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen < 34:
                raise ValueError("STREAMINFO too short")
            packed = int.from_bytes(buf[body + 10 : body + 18], "big")
            sr = packed >> 44
            ch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5 = buf[body + 18 : body + 34]
            seen_streaminfo = True
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        off = body + blen
        if last:
            break
    if not seen_streaminfo:
        raise ValueError("FLAC stream has no STREAMINFO block")
    if sr == 0:
        raise ValueError("STREAMINFO declares zero sample rate")
    return sr, ch, bps, total, md5, off


def decode_flac(buf: bytes, verify: bool = True) -> tuple[np.ndarray, int]:
    """Real FLAC subset decode → (float32 mono pcm in [-1,1], sr_hz).

    Supports mono and independent-stereo 16-bit streams with
    CONSTANT/VERBATIM subframes (exactly what :func:`encode_flac` emits,
    byte-aligned throughout). Stereo is downmixed at decode time (mean of
    channels on the raw int16 samples, same arithmetic as the WAV path, so
    identical channels decode bit-for-bit equal to the mono twin). CRC-8 is
    checked per header; CRC-16 of every frame is verified in one vectorized
    pass; the STREAMINFO MD5 is verified against the decoded interleaved
    sample stream. FIXED/LPC subframes, wasted bits, >2 channels, or the
    bit-packed left/right/mid-side stereo assignments raise
    NotImplementedError naming the unsupported feature. Malformed or
    truncated bytes raise ValueError (→ decode violation rows upstream).
    """
    if buf is None:
        raise ValueError("payload is null")
    buf = bytes(buf)
    sr, ch, bps, total, md5, off = _parse_streaminfo(buf)
    if ch not in (1, 2):
        raise NotImplementedError(
            f"subset decoder is mono/stereo-only (channels={ch})"
        )
    if bps != 16:
        raise NotImplementedError(f"subset decoder is 16-bit-only (bps={bps})")

    chunks: list[np.ndarray] = []
    spans: list[tuple[int, int, int]] = []  # (start, end_excl, expected_crc16)
    n = len(buf)
    while off < n:
        start = off
        if off + 5 > n:
            raise ValueError("truncated FLAC frame header")
        if buf[off] != 0xFF or (buf[off + 1] & 0xFC) != 0xF8:
            raise ValueError(f"bad FLAC frame sync at byte {off}")
        bs_code = buf[off + 2] >> 4
        sr_code = buf[off + 2] & 0xF
        chan_code = buf[off + 3] >> 4
        size_code = (buf[off + 3] >> 1) & 0x7
        if buf[off + 3] & 1:
            raise ValueError("reserved frame-header bit set")
        if chan_code == 0b0000:
            frame_ch = 1
        elif chan_code == 0b0001:
            frame_ch = 2  # independent left/right: two byte-aligned subframes
        elif chan_code in (0b1000, 0b1001, 0b1010):
            raise NotImplementedError(
                "left/right/mid-side stereo carries a 17-bit side channel "
                f"(channel assignment {chan_code:#06b}) — not byte-aligned, "
                "not in the decoder subset"
            )
        else:
            raise NotImplementedError(
                f"subset decoder is mono/stereo-only (channel assignment {chan_code})"
            )
        if frame_ch != ch:
            raise ValueError(
                f"frame channel assignment ({frame_ch} ch) disagrees with "
                f"STREAMINFO ({ch} ch)"
            )
        if size_code not in (0b000, 0b100):
            raise NotImplementedError(
                f"subset decoder is 16-bit-only (sample-size code {size_code:#05b})"
            )
        _num, off2 = _utf8_decode_num(buf, off + 4)
        if bs_code == 0b0000:
            raise ValueError("reserved blocksize code 0b0000")
        elif bs_code == 0b0110:
            if off2 + 1 > n:
                raise ValueError("truncated blocksize byte")
            bs = buf[off2] + 1
            off2 += 1
        elif bs_code == 0b0111:
            if off2 + 2 > n:
                raise ValueError("truncated blocksize bytes")
            bs = int.from_bytes(buf[off2 : off2 + 2], "big") + 1
            off2 += 2
        else:
            bs = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 0b0000:
            pass  # from STREAMINFO
        elif sr_code in _SR_DECODE_TABLE:
            if _SR_DECODE_TABLE[sr_code] != sr:
                raise ValueError("frame sample-rate code disagrees with STREAMINFO")
        elif sr_code == 0b1100:
            if off2 + 1 > n:
                raise ValueError("truncated sample-rate byte")
            if buf[off2] * 1000 != sr:
                raise ValueError("frame sample rate disagrees with STREAMINFO")
            off2 += 1
        elif sr_code in (0b1101, 0b1110):
            if off2 + 2 > n:
                raise ValueError("truncated sample-rate bytes")
            v = int.from_bytes(buf[off2 : off2 + 2], "big")
            if v * (1 if sr_code == 0b1101 else 10) != sr:
                raise ValueError("frame sample rate disagrees with STREAMINFO")
            off2 += 2
        else:
            raise ValueError("invalid sample-rate code 0b1111")
        if off2 + 1 > n:
            raise ValueError("truncated FLAC frame header (CRC-8)")
        if verify and crc8(buf[start:off2]) != buf[off2]:
            raise ValueError(f"FLAC frame header CRC-8 mismatch at byte {start}")
        off2 += 1

        frame_channels: list[np.ndarray] = []
        for _c in range(frame_ch):
            if off2 + 1 > n:
                raise ValueError("truncated FLAC subframe header")
            sub = buf[off2]
            off2 += 1
            if sub & 0x80:
                raise ValueError("subframe header padding bit set")
            if sub & 0x01:
                raise NotImplementedError(
                    "wasted-bits subframes not in decoder subset"
                )
            stype = (sub >> 1) & 0x3F
            if stype == 0b000000:  # CONSTANT
                if off2 + 2 > n:
                    raise ValueError("truncated CONSTANT subframe")
                val = int.from_bytes(buf[off2 : off2 + 2], "big", signed=True)
                frame_channels.append(np.full(bs, val, dtype=np.int16))
                off2 += 2
            elif stype == 0b000001:  # VERBATIM
                if off2 + 2 * bs > n:
                    raise ValueError("truncated VERBATIM subframe")
                frame_channels.append(
                    np.frombuffer(buf, dtype=">i2", count=bs, offset=off2).astype(
                        np.int16
                    )
                )
                off2 += 2 * bs
            elif 0b001000 <= stype <= 0b001100:
                raise NotImplementedError(
                    f"FIXED subframe (order {stype - 8}) not in decoder subset"
                )
            elif stype & 0b100000:
                raise NotImplementedError(
                    f"LPC subframe (order {(stype & 0x1F) + 1}) not in decoder subset"
                )
            else:
                raise ValueError(f"reserved subframe type {stype:#08b}")
        chunks.append(
            frame_channels[0]
            if frame_ch == 1
            else np.stack(frame_channels, axis=1)  # (bs, 2) interleaved order
        )

        if off2 + 2 > n:
            raise ValueError("truncated FLAC frame (CRC-16)")
        spans.append((start, off2, int.from_bytes(buf[off2 : off2 + 2], "big")))
        off = off2 + 2

    if not spans:
        raise ValueError("FLAC stream has no frames")
    if verify:
        width = max(e - s for s, e, _ in spans)
        arr = np.zeros((len(spans), width), dtype=np.uint8)
        for i, (s, e, _) in enumerate(spans):
            arr[i, width - (e - s) :] = np.frombuffer(buf, np.uint8, e - s, s)
        got = crc16_frames(arr)
        want = np.array([c for _, _, c in spans], dtype=np.uint16)
        bad = np.nonzero(got != want)[0]
        if len(bad):
            raise ValueError(
                f"FLAC frame CRC-16 mismatch in frame(s) {bad[:4].tolist()}"
            )
    ints = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
    if total and len(ints) != total:
        raise ValueError(
            f"decoded {len(ints)} samples, STREAMINFO declares {total}"
        )
    if verify and md5 != b"\x00" * 16:
        # MD5 covers the interleaved LE stream; C-order tobytes of the
        # (n, 2) stereo array is exactly that interleaving
        if hashlib.md5(ints.astype("<i2").tobytes()).digest() != md5:
            raise ValueError("FLAC stream MD5 mismatch (decoded audio differs)")
    if ch == 1:
        return ints.astype(np.float32) / 32767.0, sr
    # decode-time downmix, same arithmetic as the WAV path (mean exact in
    # float64, exactly representable in float32, then float32 division)
    return (
        ints.mean(axis=1, dtype=np.float64).astype(np.float32) / 32767.0
    ), sr

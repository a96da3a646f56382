"""Pure-numpy FLAC codec (real bytes, real decode — no external lib).

Round 2 introduced a genuine encoder/decoder pair for the byte-aligned
subset (CONSTANT/VERBATIM, mono/independent stereo, 16-bit); round 5
completes the DECODER for real-world streams: every subframe type
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), Rice- and
escape-coded residual partitions at any partition order, wasted bits, all
four stereo assignments (independent + left-side/right-side/mid-side with
their bps+1-bit side subframes), up to 8 independent channels, and
byte-multiple sample depths 8/16/24/32. The ENCODER gained a
``compression="fixed"`` mode (FIXED prediction + Rice/escape residuals,
any stereo assignment) used to generate genuinely bit-packed round-trip
vectors; its default byte-aligned VERBATIM mode is unchanged and remains
the decoder's no-bit-unpacking fast path. Per the public FLAC format spec
(https://xiph.org/flac/format.html / RFC 9639):

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

The one remaining refusal is non-byte-multiple sample depth (12/20-bit),
which raises NotImplementedError with the reason — never a wrong parse.
LPC reconstruction is an integer IIR (inherently sequential) and runs as a
plain-int Python loop per block: exact, but the slow path — FIXED/Rice and
everything byte-aligned stays vectorized.
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


# ------------------------------------------------------- bit-packing helpers


def _u_bits(v: int, n: int) -> np.ndarray:
    """One unsigned value → n MSB-first bits (header-sized, tiny n)."""
    return np.array([(v >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint8)


def _sint_block_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """Signed ints → width-bit two's-complement MSB-first bits, vectorized."""
    u = np.asarray(vals, np.int64) & ((1 << width) - 1)
    return ((u[:, None] >> np.arange(width - 1, -1, -1)) & 1).astype(np.uint8).ravel()


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, np.int64)
    return np.asarray((v << 1) ^ (v >> 63), np.int64)


def _rice_block_bits(u: np.ndarray, k: int) -> np.ndarray:
    """Zigzagged values → Rice(k) bit stream, vectorized (stop-bit scatter +
    one remainder gather; no per-value Python)."""
    q = u >> k
    lens = q + 1 + k
    ends = np.cumsum(lens)
    bits = np.zeros(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)
    stops = ends - k - 1
    bits[stops] = 1
    if k:
        idx = (stops[:, None] + 1 + np.arange(k)).ravel()
        rem = ((u[:, None] >> np.arange(k - 1, -1, -1)) & 1).astype(np.uint8).ravel()
        bits[idx] = rem
    return bits


def _encode_residual_bits(resid: np.ndarray, order: int, bs: int,
                          partition_order: int) -> list[np.ndarray]:
    """Residual section (method 0: 4-bit Rice params) → bit chunks.

    Per partition, picks the cheapest of Rice(k) for k in [0,14] or the
    escape code (raw signed values) — the same trade a real encoder makes,
    which also gives the decoder's escape path natural test coverage."""
    if bs % (1 << partition_order) or (bs >> partition_order) < order:
        raise ValueError(f"partition order {partition_order} invalid for bs={bs}")
    chunks = [_u_bits(0, 2), _u_bits(partition_order, 4)]
    per = bs >> partition_order
    pos = 0
    for p in range(1 << partition_order):
        cnt = per - (order if p == 0 else 0)
        vals = resid[pos : pos + cnt]
        pos += cnt
        u = _zigzag(vals)
        totals = [int((u >> k).sum()) + cnt * (k + 1) for k in range(15)]
        k = int(np.argmin(totals))
        width = int(max(v.bit_length() for v in np.abs(vals).tolist()) + 1) if cnt else 1
        width = min(width, 31)
        if cnt and totals[k] > 5 + cnt * width:  # escape is cheaper
            chunks += [_u_bits(15, 4), _u_bits(width, 5),
                       _sint_block_bits(vals, width)]
        else:
            chunks += [_u_bits(k, 4), _rice_block_bits(u, k)]
    return chunks


_FIXED_MAX_ORDER = 4


def _encode_subframe_fixed(x: np.ndarray, eff_bps: int,
                           partition_order: int) -> list[np.ndarray]:
    """One channel's samples → FIXED-subframe bit chunks (order chosen by
    the classic Σ|Δ^o| estimator, residual Rice/escape-coded)."""
    x = np.asarray(x, np.int64)
    bs = len(x)
    d, costs = x, []
    for o in range(_FIXED_MAX_ORDER + 1):
        if o > 0:
            d = np.diff(d)
        if len(d) == 0:
            break
        costs.append(int(np.abs(d).sum()))
    order = int(np.argmin(costs))
    po = partition_order
    while bs % (1 << po) or (bs >> po) < order:
        po -= 1  # short tail blocks cannot honor the requested order
    warm = x[:order]
    resid = np.diff(x, order) if order else x
    chunks = [_u_bits((8 + order) << 1, 8)]  # pad 0 | type | wasted 0
    if order:
        chunks.append(_sint_block_bits(warm, eff_bps))
    chunks += _encode_residual_bits(resid, order, bs, po)
    return chunks


_STEREO_MODES = {
    "independent": 0b0001, "left-side": 0b1000,
    "right-side": 0b1001, "mid-side": 0b1010,
}


# --------------------------------------------------------------------- encoder

_SR_CODE_TABLE = {
    88200: 0b0001, 176400: 0b0010, 192000: 0b0011, 8000: 0b0100,
    16000: 0b0101, 22050: 0b0110, 24000: 0b0111, 32000: 0b1000,
    44100: 0b1001, 48000: 0b1010, 96000: 0b1011,
}


def encode_flac(
    pcm: np.ndarray,
    sr_hz: int,
    block_size: int = 4096,
    compression: str = "verbatim",
    stereo_mode: str = "independent",
    partition_order: int = 0,
) -> bytes:
    """float32 [-1,1] → real FLAC bytes (16-bit).

    ``compression="verbatim"`` (default) emits the byte-aligned
    CONSTANT/VERBATIM layout — byte-identical to every prior round and the
    decoder's fast path. ``compression="fixed"`` emits genuinely bit-packed
    frames: FIXED prediction (order 0-4 per block via the Σ|Δ^o| estimator)
    with Rice- or escape-coded residual partitions, and for stereo input
    any of the four channel assignments via ``stereo_mode`` ∈ {independent,
    left-side, right-side, mid-side} (the side channel is a 17-bit
    subframe, exactly what real encoders emit). 1-D input encodes mono; a
    2-D ``(n_samples, 2)`` array encodes stereo. Same int16 quantization as
    ``encode_wav`` so the decoded PCM is sample-identical to the WAV path.
    """
    if not 16 <= block_size <= 32768:
        raise ValueError("FLAC block size must be in [16, 32768]")
    if compression not in ("verbatim", "fixed"):
        raise ValueError(f"unknown compression {compression!r}")
    if stereo_mode not in _STEREO_MODES:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if stereo_mode != "independent" and compression != "fixed":
        raise ValueError("side-channel stereo requires compression='fixed'")
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

    if channels == 1:
        chan_code = 0b0000
    elif compression == "verbatim":
        chan_code = 0b0001  # independent LR, byte-aligned
    else:
        chan_code = _STEREO_MODES[stereo_mode]

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
        if compression == "verbatim":
            if channels == 1:
                sub = _subframe(blk)
            else:
                sub = _subframe(blk[:, 0]) + _subframe(blk[:, 1])
        else:
            if channels == 1:
                subs = [(blk.astype(np.int64), 16)]
            else:
                left = blk[:, 0].astype(np.int64)
                right = blk[:, 1].astype(np.int64)
                if stereo_mode == "independent":
                    subs = [(left, 16), (right, 16)]
                elif stereo_mode == "left-side":
                    subs = [(left, 16), (left - right, 17)]
                elif stereo_mode == "right-side":
                    subs = [(left - right, 17), (right, 16)]
                else:  # mid-side
                    subs = [((left + right) >> 1, 16), (left - right, 17)]
            chunks: list[np.ndarray] = []
            for x, eff in subs:
                chunks += _encode_subframe_fixed(x, eff, partition_order)
            bits = np.concatenate(chunks)
            pad = (-len(bits)) % 8
            if pad:
                bits = np.concatenate([bits, np.zeros(pad, np.uint8)])
            sub = np.packbits(bits).tobytes()
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


# ----------------------------------------------------- bit-level frame engine
#
# Real-world FLAC streams are bit-packed: Rice-coded residuals after FIXED or
# LPC prediction, optional wasted-bits shifts, and side-channel stereo whose
# side subframe is bps+1 bits wide. The engine below decodes all of that for
# byte-multiple sample depths. The byte-aligned CONSTANT/VERBATIM path in
# decode_flac remains the fast path (it is what encode_flac's default mode
# emits, and what the bench corpus contains); frames that need bit-level work
# fall through to this engine per frame.


# below this payload size, decode_flac unpacks the whole stream's bits once
# and shares ones/successor tables across frames (35× the payload in memory —
# clip-sized audio, the engine's unit of work); larger payloads fall back to
# per-frame windows with retry
_SHARED_UNPACK_LIMIT = 8 << 20


class _WindowExhausted(Exception):
    """Internal: the unpacked bit window ended before the frame did (the
    caller retries with a larger window; only a window that already reaches
    the end of the buffer turns this into a truncation ValueError)."""


class _FrameBits:
    """Bit reader over one frame's subframe region.

    Unpacks a byte window once (``np.unpackbits``); scalar reads are short
    dot products, unary reads binary-search a precomputed ones-position
    array, and Rice blocks decode with a forward-merging scan over that
    array plus one vectorized remainder gather — no per-bit Python.
    """

    def __init__(
        self, buf: bytes, start_byte: int, window_bytes: int, shared=None
    ):
        if shared is not None:
            # whole-stream unpack shared across frames (clip-sized payloads):
            # ones/prefix-count tables amortize over every frame instead of
            # being rebuilt per overlapping window
            self._shared = shared
            self.bits = shared["bits"]
            self.ones = shared["ones"]
            self.base_byte = 0
            self.pos = start_byte * 8
            self.complete = True
        else:
            end = min(start_byte + window_bytes, len(buf))
            self.bits = np.unpackbits(
                np.frombuffer(buf, np.uint8, end - start_byte, start_byte)
            )
            self.ones = np.flatnonzero(self.bits)
            self._shared = None
            self.base_byte = start_byte
            self.pos = 0
            self.complete = end == len(buf)  # window reaches end of stream
        self.n_bits = len(self.bits)
        self._C: np.ndarray | None = None  # prefix ones count, built lazily

    def _prefix_counts(self) -> np.ndarray:
        """C[i] = number of one-bits before position i (len n_bits+1)."""
        if self._shared is not None:
            c = self._shared.get("C")
            if c is None:
                c = np.concatenate(
                    [[0], np.cumsum(self.bits, dtype=np.int64)]
                )
                self._shared["C"] = c
            return c
        if self._C is None:
            self._C = np.concatenate(
                [[0], np.cumsum(self.bits, dtype=np.int64)]
            )
        return self._C

    def _exhaust(self):
        if self.complete:
            raise ValueError("truncated FLAC frame (subframe data runs past end)")
        raise _WindowExhausted

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.n_bits:
            self._exhaust()
        self.pos = p + n
        if n == 0:
            return 0
        return int(
            self.bits[p : p + n] @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64))
        )

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def read_unary(self) -> int:
        i = int(np.searchsorted(self.ones, self.pos))
        if i >= len(self.ones):
            self._exhaust()
        s = int(self.ones[i])
        q = s - self.pos
        self.pos = s + 1
        return q

    def read_sint_block(self, count: int, width: int) -> np.ndarray:
        """count × width-bit signed two's-complement ints, vectorized."""
        p, need = self.pos, count * width
        if p + need > self.n_bits:
            self._exhaust()
        self.pos = p + need
        if count == 0 or width == 0:
            return np.zeros(count, np.int64)
        m = self.bits[p : p + need].reshape(count, width).astype(np.int64)
        v = m @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
        return v - ((v >> (width - 1)) << width)

    def read_rice_block(self, count: int, k: int) -> np.ndarray:
        """count Rice(k)-coded residuals → signed ints (zigzag undone)."""
        if count == 0:
            return np.zeros(0, np.int64)
        if k == 0:
            # no remainder bits, so the stop bits are literally the next
            # `count` ones — fully vectorized
            i0 = int(np.searchsorted(self.ones, self.pos))
            if i0 + count > len(self.ones):
                self._exhaust()
            stops = self.ones[i0 : i0 + count].astype(np.int64)
            starts = np.empty(count, np.int64)
            starts[0] = self.pos
            starts[1:] = stops[:-1] + 1
            u = stops - starts
            self.pos = int(stops[-1]) + 1
        else:
            # stop-bit orbit walk over a bounded LOCAL slice of the ones
            # array. Key identity: the number of ones skipped inside a
            # Rice code's remainder equals popcount(remainder), which the
            # prefix-count array C gives as C[stop+1+k]-C[stop+1] — so the
            # successor of stop-index j is succ[j] = j + 1 + that popcount,
            # a fully VECTORIZED build over the slice; the sequential part
            # collapses to `count` array hops with no comparisons. A block
            # of `count` Rice(k) codes touches at most count·(k+1) ones,
            # so the slice is O(count) regardless of stream length; a
            # pathological quotient overrunning it retries with a 4× slice
            # before declaring truncation.
            pos0 = self.pos
            C = self._prefix_counts()
            i0 = int(np.searchsorted(self.ones, pos0))
            hi = i0 + count * (k + 2) + 16
            while True:
                sl = self.ones[i0:hi].astype(np.int64)
                if len(sl) == 0:
                    if hi >= len(self.ones):
                        self._exhaust()
                    hi = hi * 4 + 64
                    continue
                lo_idx = np.minimum(sl + 1, self.n_bits)
                hi_idx = np.minimum(sl + 1 + k, self.n_bits)
                succ = np.arange(1, len(sl) + 1) + (C[hi_idx] - C[lo_idx])
                stop_rel = np.empty(count, np.int64)
                j, n_sl = 0, len(sl)
                overrun = False
                for i in range(count):
                    if j >= n_sl:
                        overrun = True
                        break
                    stop_rel[i] = j
                    j = succ[j]
                if not overrun:
                    break
                if i0 + n_sl >= len(self.ones):
                    self._exhaust()
                hi = i0 + n_sl * 4 + 64
            stops = sl[stop_rel]
            p = int(stops[-1]) + 1 + k
            if p > self.n_bits:
                self._exhaust()
            self.pos = p
            starts = np.empty(count, np.int64)
            starts[0] = pos0
            starts[1:] = stops[:-1] + 1 + k
            q = stops - starts
            idx = (stops[:, None] + 1) + np.arange(k)
            rem = self.bits[idx].astype(np.int64) @ (
                1 << np.arange(k - 1, -1, -1, dtype=np.int64)
            )
            u = (q << k) | rem
        return (u >> 1) ^ -(u & 1)

    def align_to_byte(self):
        pad = (-self.pos) % 8
        if pad:
            if self.read(pad) != 0:
                raise ValueError("nonzero FLAC frame padding bits (desync)")


def _read_residual(fb: _FrameBits, bs: int, order: int) -> np.ndarray:
    method = fb.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual coding method {method}")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = fb.read(4)
    nparts = 1 << porder
    if bs % nparts:
        raise ValueError(
            f"partition order {porder} does not divide block size {bs}"
        )
    per = bs >> porder
    if per < order:
        raise ValueError(f"partition order {porder} too large for order {order}")
    parts: list[np.ndarray] = []
    for p in range(nparts):
        cnt = per - (order if p == 0 else 0)
        param = fb.read(pbits)
        if param == escape:
            width = fb.read(5)
            parts.append(
                fb.read_sint_block(cnt, width)
                if width
                else np.zeros(cnt, np.int64)
            )
        else:
            parts.append(fb.read_rice_block(cnt, param))
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


def _restore_fixed(warm: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-N difference: N rounds of cumsum seeded from the
    warmup's difference pyramid. Exact int64 (|partial sums| ≪ 2^63)."""
    if order == 0:
        return resid
    seeds = []
    d = warm.astype(np.int64)
    for _ in range(order):  # seeds[j] = Δ^j x at index order-1
        seeds.append(int(d[-1]))
        d = np.diff(d)
    cur = resid.astype(np.int64)
    for j in range(order - 1, -1, -1):
        cur = seeds[j] + np.cumsum(cur)
    return np.concatenate([warm.astype(np.int64), cur])


def _restore_lpc(
    warm: np.ndarray, resid: np.ndarray, coefs: np.ndarray, shift: int
) -> np.ndarray:
    """x[i] = e[i] + (Σ c[j]·x[i-1-j]) >> shift — an integer IIR, inherently
    sequential; plain-int Python loop (exact arithmetic shift), bounded by
    block size. Real-file slow path only: encode_flac never emits LPC."""
    m = len(coefs)
    x = [int(v) for v in warm]
    c = [int(v) for v in coefs]
    for e in resid.tolist():
        acc = 0
        xi = len(x)
        for j in range(m):
            acc += c[j] * x[xi - 1 - j]
        x.append(e + (acc >> shift))
    return np.array(x, dtype=np.int64)


def _decode_subframe_bits(fb: _FrameBits, bs: int, bps: int) -> np.ndarray:
    if fb.read(1):
        raise ValueError("subframe header padding bit set")
    stype = fb.read(6)
    wasted = 0
    if fb.read(1):
        wasted = fb.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError(f"wasted bits {wasted} consume the whole sample width")
    if stype == 0b000000:  # CONSTANT
        x = np.full(bs, fb.read_signed(eff), np.int64)
    elif stype == 0b000001:  # VERBATIM
        x = fb.read_sint_block(bs, eff)
    elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
        order = stype - 8
        if order > bs:
            raise ValueError(f"FIXED order {order} exceeds block size {bs}")
        warm = fb.read_sint_block(order, eff)
        resid = _read_residual(fb, bs, order)
        x = _restore_fixed(warm, resid, order)
    elif stype & 0b100000:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        if order > bs:
            raise ValueError(f"LPC order {order} exceeds block size {bs}")
        warm = fb.read_sint_block(order, eff)
        prec = fb.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code 0b1111")
        shift = fb.read_signed(5)
        if shift < 0:
            raise ValueError(f"negative LPC shift {shift}")
        coefs = fb.read_sint_block(order, prec)
        resid = _read_residual(fb, bs, order)
        x = _restore_lpc(warm, resid, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {stype:#08b}")
    return x << wasted if wasted else x


# per-frame channel layout: channel assignment code → per-subframe extra bit
# (the difference/side channel carries bps+1 bits)
_SIDE_EXTRA = {0b1000: (0, 1), 0b1001: (1, 0), 0b1010: (0, 1)}


def _decode_frame_bits(
    buf: bytes, start_byte: int, bs: int, chan_code: int, bps: int, shared=None
) -> tuple[np.ndarray, int]:
    """Decode one frame's subframes starting byte-aligned at ``start_byte``.

    → (samples int64 — (bs,) mono or (bs, 2) L/R — , offset after subframes).
    With ``shared`` (whole-stream unpack) there is nothing to retry; the
    windowed path retries with a growing window because Rice quotients are
    unbounded in pathological streams, so the initial estimate can
    under-shoot.
    """
    nch = chan_code + 1 if chan_code <= 0b0111 else 2
    window = (bs * (bps + 10) * nch) // 8 + 64
    while True:
        fb = _FrameBits(buf, start_byte, window, shared=shared)
        try:
            if chan_code <= 0b0111:  # independent channels
                chans = [_decode_subframe_bits(fb, bs, bps) for _ in range(nch)]
            else:
                extra = _SIDE_EXTRA[chan_code]
                chans = [
                    _decode_subframe_bits(fb, bs, bps + extra[c]) for c in range(2)
                ]
            fb.align_to_byte()
            break
        except _WindowExhausted:
            window *= 4
    end = fb.base_byte + fb.pos // 8
    if chan_code <= 0b0111:
        out = chans[0] if nch == 1 else np.stack(chans, axis=1)
    elif chan_code == 0b1000:  # left-side: right = left - side
        out = np.stack([chans[0], chans[0] - chans[1]], axis=1)
    elif chan_code == 0b1001:  # right-side: left = right + side
        out = np.stack([chans[0] + chans[1], chans[1]], axis=1)
    else:  # mid-side
        mid, side = chans
        mid = (mid << 1) | (side & 1)
        out = np.stack([(mid + side) >> 1, (mid - side) >> 1], axis=1)
    return out, end


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


# frame-header sample-size codes → bits (0b000 = from STREAMINFO)
_SIZE_CODE_BITS = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def decode_flac(buf: bytes, verify: bool = True) -> tuple[np.ndarray, int]:
    """Full FLAC decode → (float32 mono pcm in [-1,1], sr_hz).

    Round 5 completes the decoder for real-world streams: every subframe
    type (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), Rice and
    escape-coded residual partitions at any partition order, wasted bits,
    every stereo assignment (independent, left-side, right-side, mid-side),
    up to 8 independent channels, and byte-multiple sample depths
    (8/16/24/32-bit; non-byte depths like 12/20-bit refuse honestly).
    Multi-channel audio is downmixed at decode time (mean of channels on
    the raw integer samples, same arithmetic as the WAV path, so identical
    channels decode bit-for-bit equal to the mono twin). CRC-8 is checked
    per header; CRC-16 of every frame is verified in one vectorized pass;
    the STREAMINFO MD5 is verified against the decoded interleaved sample
    stream. The byte-aligned CONSTANT/VERBATIM layout that
    :func:`encode_flac` emits by default stays on the fast numpy path;
    bit-packed frames route through the `_FrameBits` engine per frame.
    Malformed or truncated bytes raise ValueError (→ decode violation rows
    upstream).
    """
    if buf is None:
        raise ValueError("payload is null")
    buf = bytes(buf)
    sr, ch, bps, total, md5, off = _parse_streaminfo(buf)
    if ch < 1 or ch > 8:
        raise ValueError(f"invalid FLAC channel count {ch}")
    if bps not in (8, 16, 24, 32):
        raise NotImplementedError(
            f"decoder supports byte-multiple sample depths only (bps={bps})"
        )
    samp_dtype = np.int16 if bps <= 16 else np.int32

    chunks: list[np.ndarray] = []
    spans: list[tuple[int, int, int]] = []  # (start, end_excl, expected_crc16)
    shared_bits = None  # whole-stream unpack, built on first bit-packed frame
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
        if chan_code <= 0b0111:
            frame_ch = chan_code + 1  # independent channels
        elif chan_code in (0b1000, 0b1001, 0b1010):
            frame_ch = 2  # left-side / right-side / mid-side
        else:
            raise ValueError(f"reserved channel assignment {chan_code:#06b}")
        if frame_ch != ch:
            raise ValueError(
                f"frame channel assignment ({frame_ch} ch) disagrees with "
                f"STREAMINFO ({ch} ch)"
            )
        if size_code == 0b011:
            raise ValueError("reserved sample-size code 0b011")
        if size_code != 0b000 and _SIZE_CODE_BITS[size_code] != bps:
            raise ValueError(
                f"frame sample-size code ({_SIZE_CODE_BITS[size_code]}-bit) "
                f"disagrees with STREAMINFO ({bps}-bit)"
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

        # FAST PATH — the byte-aligned 16-bit CONSTANT/VERBATIM layout that
        # encode_flac emits by default (and the bench corpus contains):
        # pure np.frombuffer, no bit unpacking. Anything else (FIXED/LPC/
        # wasted bits/side stereo/non-16-bit) falls through to the bit
        # engine for this frame.
        fast = None
        if bps == 16 and chan_code in (0b0000, 0b0001):
            fast_off = off2
            fast_channels: list[np.ndarray] = []
            for _c in range(frame_ch):
                if fast_off + 1 > n:
                    raise ValueError("truncated FLAC subframe header")
                sub = buf[fast_off]
                if sub & 0x80:
                    raise ValueError("subframe header padding bit set")
                stype = (sub >> 1) & 0x3F
                if sub & 0x01 or stype not in (0b000000, 0b000001):
                    fast_channels = []
                    break
                fast_off += 1
                if stype == 0b000000:  # CONSTANT
                    if fast_off + 2 > n:
                        raise ValueError("truncated CONSTANT subframe")
                    val = int.from_bytes(
                        buf[fast_off : fast_off + 2], "big", signed=True
                    )
                    fast_channels.append(np.full(bs, val, dtype=np.int16))
                    fast_off += 2
                else:  # VERBATIM
                    if fast_off + 2 * bs > n:
                        raise ValueError("truncated VERBATIM subframe")
                    fast_channels.append(
                        np.frombuffer(
                            buf, dtype=">i2", count=bs, offset=fast_off
                        ).astype(np.int16)
                    )
                    fast_off += 2 * bs
            if fast_channels:
                fast = (
                    fast_channels[0]
                    if frame_ch == 1
                    else np.stack(fast_channels, axis=1)
                )
                off2 = fast_off
        if fast is not None:
            chunks.append(fast)
        else:
            if shared_bits is None and n <= _SHARED_UNPACK_LIMIT:
                all_bits = np.unpackbits(np.frombuffer(buf, np.uint8))
                shared_bits = {
                    "bits": all_bits, "ones": np.flatnonzero(all_bits)
                }
            samples, off2 = _decode_frame_bits(
                buf, off2, bs, chan_code, bps, shared=shared_bits
            )
            chunks.append(samples.astype(samp_dtype))

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
        # MD5 covers the interleaved LE stream (bps/8 bytes per sample);
        # C-order tobytes of an (n, ch) array is exactly that interleaving
        if bps == 8:
            stream = ints.astype(np.int8).tobytes()
        elif bps == 16:
            stream = ints.astype("<i2").tobytes()
        elif bps == 24:
            v = (ints.astype(np.int64).ravel() & 0xFFFFFF).astype(np.uint32)
            b3 = np.empty((len(v), 3), dtype=np.uint8)
            b3[:, 0] = v & 0xFF
            b3[:, 1] = (v >> 8) & 0xFF
            b3[:, 2] = (v >> 16) & 0xFF
            stream = b3.tobytes()
        else:
            stream = ints.astype("<i4").tobytes()
        if hashlib.md5(stream).digest() != md5:
            raise ValueError("FLAC stream MD5 mismatch (decoded audio differs)")
    scale = np.float32(float((1 << (bps - 1)) - 1))
    if ch == 1:
        return ints.astype(np.float32) / scale, sr
    # decode-time downmix, same arithmetic as the WAV path (mean exact in
    # float64, exactly representable in float32, then float32 division)
    return (
        ints.mean(axis=1, dtype=np.float64).astype(np.float32) / scale
    ), sr

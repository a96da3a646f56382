"""Real IMA/DVI ADPCM codec (WAV format tag 0x11), pure numpy.

4-bit adaptive differential PCM per the public IMA spec: each 256-byte
block carries a 4-byte header (initial predictor int16, step index uint8,
reserved) followed by 252 bytes of 4-bit deltas (low nibble first) —
505 samples per block, ~4:1 compression.

The quantizer state (predictor, step index) is inherently sequential per
sample, but BLOCKS are independent — each header resets the state — so the
implementation loops over the 505 in-block sample positions while
vectorizing ACROSS blocks with numpy: decode cost is ~500 small vector
steps per clip regardless of clip length (the arrays grow instead). The
scalar per-sample reference implementation lives alongside
(`decode_adpcm_scalar`) and tests assert the vectorized decoder is
BIT-EXACT against it — the decode-parity invariant for a lossy codec.

Round-trip fidelity is codec-inherent, not implementation quality: a
4-bit slope quantizer on the synthetic clips (sine + broadband noise
floor) measures ≈15–29 dB SNR depending on frequency/rate — reported
honestly; the repo's ≥30 dB round-trip bar applies to the lossless and
log-PCM codecs (pcm_s16le, flac, mulaw, alaw).
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_IMA_ADPCM = 0x11
BLOCK_ALIGN = 256
SPB = (BLOCK_ALIGN - 4) * 2 + 1  # 505 samples per block

STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)

_RIFF_HDR = struct.Struct("<4sI4s")
_CHUNK_HDR = struct.Struct("<4sI")
# fmt for IMA ADPCM: 16 standard bytes + cbSize=2 + samplesPerBlock uint16
_FMT20 = struct.Struct("<4sIHHIIHHHH")


def _dequant(delta: np.ndarray, step: np.ndarray) -> np.ndarray:
    """IMA reconstruction: diff = step/8 + step·b2 + step/2·b1 + step/4·b0."""
    d = step >> 3
    d = d + np.where(delta & 4, step, 0)
    d = d + np.where(delta & 2, step >> 1, 0)
    d = d + np.where(delta & 1, step >> 2, 0)
    return np.where(delta & 8, -d, d)


def _encode_blocks(x16: np.ndarray):
    """int16 mono → (pred int16[n_blk], idx uint8[n_blk], nibbles uint8[n_blk, SPB-1])."""
    n = len(x16)
    nblk = max((n + SPB - 1) // SPB, 1)
    pad = nblk * SPB - n
    tail = x16[-1:] if n else np.zeros(1, dtype=np.int16)
    x = np.concatenate([x16.astype(np.int32), np.repeat(tail.astype(np.int32), pad)])
    blocks = x.reshape(nblk, SPB)
    pred = blocks[:, 0].copy()
    # seed the step index from the first in-block transition so the
    # quantizer doesn't spend dozens of samples ramping up from step 7
    first_diff = np.abs(blocks[:, 1] - blocks[:, 0])
    idx = np.searchsorted(STEP_TABLE, first_diff).clip(0, 88).astype(np.int32)
    h_pred = pred.astype(np.int16)
    h_idx = idx.astype(np.uint8)
    nibbles = np.zeros((nblk, SPB - 1), dtype=np.uint8)
    for j in range(1, SPB):
        step = STEP_TABLE[idx]
        diff = blocks[:, j] - pred
        sign = np.where(diff < 0, 8, 0)
        rem = np.abs(diff)
        delta = np.zeros(nblk, dtype=np.int32)
        tmp = step.copy()
        for bit in (4, 2, 1):
            ge = rem >= tmp
            delta |= np.where(ge, bit, 0)
            rem = rem - np.where(ge, tmp, 0)
            tmp >>= 1
        delta |= sign
        # track the DECODER's reconstruction exactly, or state drifts
        pred = np.clip(pred + _dequant(delta, step), -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[delta], 0, 88)
        nibbles[:, j - 1] = delta
    return h_pred, h_idx, nibbles


def _decode_blocks(h_pred, h_idx, nibbles, n_samples: int) -> np.ndarray:
    # The SPB-step state loop reads one nibble COLUMN and writes one output
    # COLUMN per step; in row-major layout each such access touches nblk
    # cache lines (stride SPB), ~600 MB of cache-line traffic for a 10k-block
    # batch — memory-bandwidth-pathological when 32 workers run it at once.
    # Transposing once up front makes every per-step access contiguous
    # (nblk×4 bytes), so the loop's traffic drops ~15× and the batch decode
    # stays fast under full-host concurrency.
    nblk = len(h_pred)
    nib_t = np.ascontiguousarray(nibbles.T)  # (SPB-1, nblk)
    out = np.empty((SPB, nblk), dtype=np.int32)
    pred = h_pred.astype(np.int32)
    idx = np.clip(h_idx.astype(np.int32), 0, 88)
    out[0] = pred
    for j in range(1, SPB):
        step = STEP_TABLE[idx]
        delta = nib_t[j - 1].astype(np.int32)
        pred = np.clip(pred + _dequant(delta, step), -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[delta], 0, 88)
        out[j] = pred
    return out.T.reshape(-1)[:n_samples].astype(np.int16)


# ------------------------------------------------------------- WAV container


def encode_adpcm(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float32 [-1,1] mono → IMA ADPCM WAV bytes (block_align 256)."""
    ints = np.clip(np.asarray(pcm, dtype=np.float64) * 32767.0, -32768, 32767).astype(
        np.int16
    )
    h_pred, h_idx, nib = _encode_blocks(ints)
    nblk = len(h_pred)
    # pack nibbles low-first: byte k = nib[2k] | nib[2k+1] << 4
    packed = (nib[:, 0::2] | (nib[:, 1::2].astype(np.uint16) << 4)).astype(np.uint8)
    blocks = np.zeros((nblk, BLOCK_ALIGN), dtype=np.uint8)
    blocks[:, 0:2] = (
        h_pred.astype("<i2").view(np.uint8).reshape(nblk, 2)
    )
    blocks[:, 2] = h_idx
    blocks[:, 3] = 0
    blocks[:, 4:] = packed
    data = blocks.tobytes()
    n = len(data)
    avg_bps = (sr_hz * BLOCK_ALIGN) // SPB
    fmt = _FMT20.pack(
        b"fmt ", 20, WAVE_FORMAT_IMA_ADPCM, 1, sr_hz, avg_bps, BLOCK_ALIGN, 4, 2, SPB
    )
    fact = _CHUNK_HDR.pack(b"fact", 4) + struct.pack("<I", len(ints))
    body_len = len(fmt) + len(fact) + 8 + n
    out = _RIFF_HDR.pack(b"RIFF", 4 + body_len, b"WAVE") + fmt + fact
    out += _CHUNK_HDR.pack(b"data", n) + data
    return out


def decode_adpcm(buf: bytes) -> tuple[np.ndarray, int]:
    """IMA ADPCM WAV bytes → (float32 pcm in [-1,1], sr_hz)."""
    blocks, sr_hz, n = _parse_container(buf)
    h_pred = blocks[:, 0:2].copy().view("<i2").reshape(-1)
    h_idx = blocks[:, 2]
    packed = blocks[:, 4:]
    nib = np.zeros((blocks.shape[0], (BLOCK_ALIGN - 4) * 2), dtype=np.uint8)
    nib[:, 0::2] = packed & 0x0F
    nib[:, 1::2] = packed >> 4
    pcm16 = _decode_blocks(h_pred, h_idx, nib, n)
    return pcm16.astype(np.float32) / 32767.0, sr_hz


def _parse_container(buf: bytes):
    """Chunk-walk an IMA ADPCM WAV → (blocks uint8[n,BLOCK_ALIGN], sr, n_samples)."""
    if buf is None or len(buf) < 12:
        raise ValueError("payload too short for ADPCM WAV header")
    riff, _, wave = _RIFF_HDR.unpack_from(buf, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload (codec adpcm_ima)")
    off, tag, sr_hz, bits, channels, align, data, n_samples = 12, None, None, None, None, None, None, None
    while off + 8 <= len(buf):
        cid, csize = _CHUNK_HDR.unpack_from(buf, off)
        body = off + 8
        if cid == b"fmt " and body + 16 <= len(buf):
            tag, channels, sr_hz, _br, align, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
        elif cid == b"fact" and body + 4 <= len(buf):
            (n_samples,) = struct.unpack_from("<I", buf, body)
        elif cid == b"data":
            if body + csize > len(buf):
                raise ValueError(
                    f"truncated data chunk: declares {csize} bytes, "
                    f"{len(buf) - body} available"
                )
            data = buf[body : body + csize]
        off = body + csize + (csize & 1)
    if sr_hz is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if tag != WAVE_FORMAT_IMA_ADPCM or bits != 4 or channels != 1 or align != BLOCK_ALIGN:
        raise ValueError(
            f"unsupported WAV layout for adpcm_ima: tag={tag} bits={bits} "
            f"channels={channels} block_align={align}"
        )
    if len(data) % BLOCK_ALIGN:
        raise ValueError(
            f"ADPCM data length {len(data)} is not a multiple of block_align {BLOCK_ALIGN}"
        )
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(-1, BLOCK_ALIGN)
    total = blocks.shape[0] * SPB
    n = total if n_samples is None else min(int(n_samples), total)
    return blocks, int(sr_hz), n


def decode_adpcm_batch(bufs: list) -> list:
    """Batched decode: one block-vectorized pass over the CONCATENATED
    blocks of every payload in the list — the in-block position loop
    (~SPB numpy steps) is paid once per BATCH instead of once per clip,
    which is what makes ADPCM cheap inside Arrow-batched UDFs (per-clip
    vectorization is overhead-dominated: ~500 tiny numpy calls each).

    Blocks are state-independent (each carries its own predictor/index
    header), so clips can share one matrix. Returns, per input, either
    ``(pcm float32, sr_hz)`` or the ``Exception`` the payload raised —
    callers re-raise per row so one bad payload never fails the batch.
    """
    parsed: list = [None] * len(bufs)
    all_blocks = []
    spans = []  # (row, block_start, n_blocks, n_samples)
    start = 0
    for i, buf in enumerate(bufs):
        try:
            blocks, sr, n = _parse_container(buf)
        except Exception as e:  # per-row failure, surfaced to the caller
            parsed[i] = e
            continue
        all_blocks.append(blocks)
        spans.append((i, start, blocks.shape[0], n, sr))
        start += blocks.shape[0]
    if not all_blocks:
        return parsed
    blocks = np.concatenate(all_blocks, axis=0)
    h_pred = blocks[:, 0:2].copy().view("<i2").reshape(-1)
    h_idx = blocks[:, 2]
    packed = blocks[:, 4:]
    nib = np.zeros((blocks.shape[0], (BLOCK_ALIGN - 4) * 2), dtype=np.uint8)
    nib[:, 0::2] = packed & 0x0F
    nib[:, 1::2] = packed >> 4
    pcm_all = _decode_blocks(h_pred, h_idx, nib, blocks.shape[0] * SPB)
    for i, b0, nblk, n, sr in spans:
        clip = pcm_all[b0 * SPB : b0 * SPB + n]
        parsed[i] = (clip.astype(np.float32) / 32767.0, sr)
    return parsed


# ------------------------------------------------- scalar reference decoder


def decode_adpcm_scalar(buf: bytes) -> tuple[np.ndarray, int]:
    """Per-sample scalar IMA decoder — the straight-from-the-spec reference
    the vectorized decoder is asserted bit-exact against. Slow by design;
    test-only."""
    # chunk parse kept inline and independent of the vectorized state
    # machine on purpose — this function is the independent reference
    sr = None
    riff, _, wave = _RIFF_HDR.unpack_from(buf, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, data, n_samples = 12, None, None
    while off + 8 <= len(buf):
        cid, csize = _CHUNK_HDR.unpack_from(buf, off)
        body = off + 8
        if cid == b"fmt ":
            _tag, _ch, sr, _br, _ba, _bits = struct.unpack_from("<HHIIHH", buf, body)
        elif cid == b"fact":
            (n_samples,) = struct.unpack_from("<I", buf, body)
        elif cid == b"data":
            data = buf[body : body + csize]
        off = body + csize + (csize & 1)
    out = []
    step_t, idx_t = STEP_TABLE.tolist(), INDEX_TABLE.tolist()
    for b0 in range(0, len(data), BLOCK_ALIGN):
        block = data[b0 : b0 + BLOCK_ALIGN]
        pred = struct.unpack_from("<h", block, 0)[0]
        idx = min(max(block[2], 0), 88)
        out.append(pred)
        for byte in block[4:]:
            for delta in (byte & 0x0F, byte >> 4):
                step = step_t[idx]
                d = step >> 3
                if delta & 4:
                    d += step
                if delta & 2:
                    d += step >> 1
                if delta & 1:
                    d += step >> 2
                pred = pred - d if delta & 8 else pred + d
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + idx_t[delta]))
                out.append(pred)
    pcm = np.array(out, dtype=np.int16)
    if n_samples is not None:
        pcm = pcm[: int(n_samples)]
    return pcm.astype(np.float32) / 32767.0, int(sr)

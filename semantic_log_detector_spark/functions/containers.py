"""Container-level metadata probes for codecs without an in-container
decoder (opus, mp3).

A validation engine over 10^12 clips cannot simply skip payloads it cannot
decode: the CONTAINER structure is still fully checkable — framing
integrity (Ogg page CRC-32, MPEG sync walk), declared channel/sample-rate
metadata, and container-derived duration. These probes parse the public
container formats exactly and return metadata for the R068 container-meta
check (checks/drift.py), while audio decode continues to refuse honestly
(functions/audio.py fake/R062 machinery is unchanged).

Formats per public specs only:
* Ogg framing — RFC 3533 (page structure, lacing, granule positions,
  CRC-32 poly 0x04C11DB7 init 0 non-reflected over the page with a zeroed
  CRC field).
* Opus-in-Ogg — RFC 7845 (OpusHead: version, channels, pre-skip, input
  sample rate; granule positions always at 48 kHz; duration = last granule
  − pre-skip).
* MPEG audio — ISO/IEC 11172-3 / 13818-3 frame headers (MPEG1/2/2.5,
  Layer I/II/III bitrate + sample-rate tables, frame-length formulas,
  ID3v2/ID3v1 tag skipping); duration = Σ samples-per-frame / sr.

Reference seam: the reference validates flow metadata before scoring
(src/detection/pipeline.py feature preconditions); this is that contract
applied to undecodable audio payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ Ogg CRC32

_OGG_CRC_POLY = 0x04C11DB7  # non-reflected, init 0, xorout 0 (RFC 3533 A.1)


def _ogg_crc_table() -> np.ndarray:
    tab = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << 24
        for _ in range(8):
            r = ((r << 1) ^ _OGG_CRC_POLY) & 0xFFFFFFFF if r & 0x80000000 else (
                (r << 1) & 0xFFFFFFFF
            )
        tab[b] = r
    return tab


_CRC_TAB = _ogg_crc_table()
_CRC_LIST = _CRC_TAB.tolist()  # plain ints: no numpy scalar boxing in the loop

# Vectorization of the CRC recurrence (the R068 probe CRC-checks EVERY page
# of every undecodable clip — a per-byte Python loop here would dominate
# the whole drift pass at corpus scale). The LFSR state is linear over
# GF(2) in (init, message) and init is 0, so: (a) leading zero bytes keep
# the state at 0 — left-padding is free; (b) crc(A||B) =
# shift_|B|(crc(A)) XOR crc(B) — the zlib crc32_combine identity. Split
# the page into R rows of C bytes (R padded to a power of two with zero
# rows at the FRONT — free by (a)), run the byte-table recurrence
# COLUMN-wise over all rows at once (C numpy ops on R-vectors instead of
# R*C Python iterations), then tree-combine adjacent rows in log2(R)
# vectorized levels, doubling the precomputed shift operator (its 32
# GF(2) basis images) at each level.
_COMBINE_C = 64


def _shift_c_basis(c: int) -> np.ndarray:
    """Images of the 32 basis states under 'shift c zero bytes through'."""
    s = (np.uint32(1) << np.arange(32, dtype=np.uint32)).astype(np.uint32)
    for _ in range(c):
        s = ((s << np.uint32(8)) ^ _CRC_TAB[s >> np.uint32(24)]).astype(np.uint32)
    return s


_MC = _shift_c_basis(_COMBINE_C)
_BITSEL = np.arange(32, dtype=np.uint32)


def _apply_shift(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Linear shift operator (32 basis images) applied to each uint32 in v."""
    bits = ((v[:, None] >> _BITSEL[None, :]) & np.uint32(1)).astype(bool)
    return np.bitwise_xor.reduce(
        np.where(bits, m[None, :], np.uint32(0)), axis=1)


def ogg_crc(data: bytes) -> int:
    """CRC-32/Ogg of one page (with its CRC field zeroed)."""
    n = len(data)
    if n < 2048:  # vector setup doesn't pay below ~2 KB
        r = 0
        tab = _CRC_LIST
        for b in data:
            r = ((r << 8) & 0xFFFFFFFF) ^ tab[(r >> 24) ^ b]
        return r
    c = _COMBINE_C
    rows = 1 << (-(-n // c) - 1).bit_length()
    arr = np.zeros(rows * c, dtype=np.uint8)
    arr[rows * c - n:] = np.frombuffer(data, dtype=np.uint8)
    arr = arr.reshape(rows, c)
    s = np.zeros(rows, dtype=np.uint32)
    tab = _CRC_TAB
    for col in range(c):
        s = ((s << np.uint32(8)) ^ tab[(s >> np.uint32(24)) ^ arr[:, col]]) \
            .astype(np.uint32)
    m = _MC
    while len(s) > 1:  # crc(A||B) = shift_|B|(crc A) ^ crc B, pairwise
        s = _apply_shift(m, s[0::2]) ^ s[1::2]
        if len(s) > 1:
            m = _apply_shift(m, m)  # double the shift span
    return int(s[0])


# ------------------------------------------------------------ Ogg page walker

_OGG_HDR = struct.Struct("<4sBBqIII")  # magic, ver, type, granule, serial, seq, crc


def _ogg_pages(buf: bytes):
    """Yield (header_type, granule, serial, seq, packets_payload) per page,
    verifying magic, version, and CRC-32. Raises ValueError on corruption."""
    off, n = 0, len(buf)
    while off < n:
        if off + 27 > n:
            raise ValueError("truncated Ogg page header")
        magic, ver, htype, granule, serial, seq, crc = _OGG_HDR.unpack_from(buf, off)
        if magic != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at byte {off}")
        if ver != 0:
            raise ValueError(f"unsupported Ogg stream structure version {ver}")
        nseg = buf[off + 26]
        seg_end = off + 27 + nseg
        if seg_end > n:
            raise ValueError("truncated Ogg segment table")
        lacing = buf[off + 27 : seg_end]
        body_len = sum(lacing)
        page_end = seg_end + body_len
        if page_end > n:
            raise ValueError("truncated Ogg page body")
        page = bytearray(buf[off:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at byte {off}")
        yield htype, granule, serial, seq, buf[seg_end:page_end]
        off = page_end


def probe_ogg_opus(buf: bytes) -> dict:
    """Structural probe of an Ogg Opus stream → container metadata.

    Verifies every page's CRC, parses OpusHead (RFC 7845 §5.1), and derives
    duration from the final granule position (48 kHz ticks) minus pre-skip.
    Returns {container, channels, input_sample_rate_hz, pre_skip,
    duration_ms, n_pages}. Raises ValueError on any structural defect.
    """
    if buf is None or len(buf) < 47:
        raise ValueError("payload too short for an Ogg Opus stream")
    buf = bytes(buf)
    head = None
    last_granule = 0
    n_pages = 0
    saw_eos = False
    for htype, granule, _serial, seq, body in _ogg_pages(buf):
        n_pages += 1
        if seq == 0:
            if not (htype & 0x02):
                raise ValueError("first Ogg page is not marked beginning-of-stream")
            if len(body) < 19 or body[:8] != b"OpusHead":
                raise ValueError("first Ogg packet is not an OpusHead")
            version = body[8]
            if version >> 4 != 0:  # RFC 7845: major version must be 0
                raise ValueError(f"unsupported OpusHead version {version}")
            channels = body[9]
            pre_skip = int.from_bytes(body[10:12], "little")
            input_sr = int.from_bytes(body[12:16], "little")
            if channels < 1:
                raise ValueError("OpusHead declares zero channels")
            head = {
                "channels": int(channels),
                "pre_skip": pre_skip,
                "input_sample_rate_hz": int(input_sr),
            }
        if granule >= 0:
            last_granule = max(last_granule, granule)
        if htype & 0x04:
            saw_eos = True
    if head is None:
        raise ValueError("Ogg stream has no OpusHead page")
    if not saw_eos:
        raise ValueError("Ogg stream has no end-of-stream page")
    samples_48k = max(0, last_granule - head["pre_skip"])
    return {
        "container": "ogg_opus",
        "duration_ms": samples_48k * 1000.0 / 48000.0,
        "duration_grain_ms": 0.0,  # granule positions are sample-exact
        "n_pages": n_pages,
        **head,
    }


# --------------------------------------------------------------- MPEG audio

# bitrate tables (kbps), index 1-14; index 0 = free, 15 = invalid
_BR_V1 = {
    1: (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BR_V2 = {
    1: (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SR_TABLE = {3: (44100, 48000, 32000),   # MPEG1  (version bits 11)
             2: (22050, 24000, 16000),   # MPEG2  (version bits 10)
             0: (11025, 12000, 8000)}    # MPEG2.5 (version bits 00)


def _id3v2_len(buf: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none)."""
    if len(buf) >= 10 and buf[:3] == b"ID3":
        size = ((buf[6] & 0x7F) << 21 | (buf[7] & 0x7F) << 14
                | (buf[8] & 0x7F) << 7 | (buf[9] & 0x7F))
        return 10 + size + (10 if buf[5] & 0x10 else 0)  # footer flag
    return 0


def probe_mp3(buf: bytes) -> dict:
    """Structural probe of an MPEG audio stream → container metadata.

    Skips ID3v2/ID3v1 tags, walks every frame header (sync, version, layer,
    bitrate, sample rate, padding; frame length per ISO 11172-3), requires
    a consistent version/layer/sample-rate across frames, and sums
    per-frame durations. Returns {container, sample_rate_hz, channels,
    n_frames, duration_ms, layer, bitrate_kbps (None if VBR)}. Raises
    ValueError on desync or an invalid header — never a guess.
    """
    if buf is None or len(buf) < 4:
        raise ValueError("payload too short for an MPEG audio stream")
    buf = bytes(buf)
    off = _id3v2_len(buf)
    end = len(buf)
    if end - off >= 128 and buf[end - 128 : end - 125] == b"TAG":
        end -= 128  # trailing ID3v1
    sr_hz = version = layer = channels = None
    n_frames = 0
    bitrates: set[int] = set()
    samples_total = 0
    while off < end:
        if off + 4 > end:
            raise ValueError(f"truncated MPEG frame header at byte {off}")
        h = int.from_bytes(buf[off : off + 4], "big")
        if h >> 21 != 0x7FF:
            raise ValueError(f"lost MPEG sync at byte {off}")
        ver_bits = (h >> 19) & 0x3
        layer_bits = (h >> 17) & 0x3
        if ver_bits == 1 or layer_bits == 0:
            raise ValueError(f"reserved MPEG version/layer at byte {off}")
        lay = 4 - layer_bits  # 1/2/3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if br_idx in (0, 15):
            raise ValueError(f"free/invalid MPEG bitrate index at byte {off}")
        if sr_idx == 3:
            raise ValueError(f"reserved MPEG sample-rate index at byte {off}")
        sr = _SR_TABLE[ver_bits][sr_idx]
        br = (_BR_V1 if ver_bits == 3 else _BR_V2)[lay][br_idx - 1]
        if sr_hz is None:
            sr_hz, version, layer = sr, ver_bits, lay
            channels = 1 if mode == 3 else 2
        elif (sr, ver_bits, lay) != (sr_hz, version, layer):
            raise ValueError(f"MPEG stream parameters change at byte {off}")
        if lay == 1:
            samples = 384
            flen = (12 * br * 1000 // sr + padding) * 4
        else:
            samples = 1152 if (lay == 2 or ver_bits == 3) else 576
            per = 144 if (lay == 2 or ver_bits == 3) else 72
            flen = per * br * 1000 // sr + padding
        if flen <= 4:
            raise ValueError(f"degenerate MPEG frame length at byte {off}")
        samples_total += samples
        bitrates.add(br)
        n_frames += 1
        off += flen
    if n_frames == 0 or sr_hz is None:
        raise ValueError("MPEG stream has no frames")
    if off != end:
        raise ValueError("MPEG stream ends mid-frame")
    return {
        "container": "mpeg_audio",
        "sample_rate_hz": int(sr_hz),
        "channels": int(channels),
        "layer": int(layer),
        "n_frames": n_frames,
        "bitrate_kbps": bitrates.pop() if len(bitrates) == 1 else None,
        "duration_ms": samples_total * 1000.0 / sr_hz,
        # duration is quantized to whole frames — the R068 tolerance floor
        "duration_grain_ms": samples_total * 1000.0 / sr_hz / n_frames,
    }


# ------------------------------------------------------------------ dispatch

PROBERS = {"opus": probe_ogg_opus, "mp3": probe_mp3}


def probe_clip(buf: bytes, codec: str) -> dict:
    """Container probe by codec label. KeyError for unprobeable codecs."""
    return PROBERS[codec](buf)


# ------------------------------------------------- structurally-valid shells
#
# Fixture generators: REAL container framing around deterministic junk audio
# packets (this build has no opus/mp3 ENCODER either — the shells exist so
# the probes and the R068 check can be tested on byte-exact structures).
# The junk payloads are honest: decode still refuses via container magic.


def ogg_opus_shell(
    sr_hz: int, dur_ms: int, channels: int = 1, pre_skip: int = 312,
    seed: int = 0,
) -> bytes:
    """Structurally-valid Ogg Opus stream: correct pages, CRCs, OpusHead
    (input_sample_rate=sr_hz), granule positions for dur_ms — junk packets."""
    rng = np.random.Generator(np.random.Philox(key=seed))

    def page(htype: int, granule: int, seq: int, packets: list[bytes]) -> bytes:
        lacing = bytearray()
        body = bytearray()
        for p in packets:
            q, r = divmod(len(p), 255)
            lacing += b"\xff" * q + bytes([r])
            body += p
        hdr = bytearray(
            _OGG_HDR.pack(b"OggS", 0, htype, granule, 0x5AFE, seq, 0)
        )
        hdr.append(len(lacing))
        pg = bytes(hdr) + bytes(lacing) + bytes(body)
        crc = ogg_crc(pg)
        return pg[:22] + crc.to_bytes(4, "little") + pg[26:]

    head = (b"OpusHead" + bytes([1, channels])
            + pre_skip.to_bytes(2, "little")
            + int(sr_hz).to_bytes(4, "little")
            + (0).to_bytes(2, "little") + bytes([0]))
    tags = b"OpusTags" + (4).to_bytes(4, "little") + b"sld:" + (0).to_bytes(
        4, "little"
    )
    total_48k = int(round(dur_ms * 48000 / 1000.0))
    # junk "opus packets": 20 ms each at 48 kHz granule rate
    n_pk = max(1, total_48k // 960)
    pages = [page(0x02, 0, 0, [head]), page(0x00, 0, 1, [tags])]
    done = 0
    seq = 2
    while done < n_pk:
        take = min(25, n_pk - done)
        done += take
        granule = pre_skip + (total_48k if done == n_pk else done * 960)
        pk = [bytes(rng.integers(0, 256, size=int(rng.integers(8, 40)),
                                 dtype=np.uint8)) for _ in range(take)]
        htype = 0x04 if done == n_pk else 0x00
        pages.append(page(htype, granule, seq, pk))
        seq += 1
    return b"".join(pages)


def mp3_shell(sr_hz: int, dur_ms: int, bitrate_kbps: int | None = None,
              id3: bool = False) -> bytes:
    """Structurally-valid MPEG Layer III stream (version chosen from sr_hz):
    exact frame headers and lengths, zero payload bytes."""
    for ver_bits, srs in _SR_TABLE.items():
        if sr_hz in srs:
            sr_idx = srs.index(sr_hz)
            break
    else:
        raise ValueError(f"{sr_hz} Hz is not an MPEG audio sample rate")
    table = (_BR_V1 if ver_bits == 3 else _BR_V2)[3]
    br = bitrate_kbps or (64 if ver_bits == 3 else 32)
    if br not in table:
        raise ValueError(f"bitrate {br} invalid for this MPEG version")
    br_idx = table.index(br) + 1
    samples = 1152 if ver_bits == 3 else 576
    per = 144 if ver_bits == 3 else 72
    flen = per * br * 1000 // sr_hz  # no padding
    n_frames = max(1, int(round(dur_ms * sr_hz / 1000.0 / samples)))
    h = (0x7FF << 21) | (ver_bits << 19) | (0b01 << 17) | (1 << 16)  # L3, no CRC
    h |= (br_idx << 12) | (sr_idx << 10) | (0b11 << 6)  # mono
    frame = h.to_bytes(4, "big") + b"\x00" * (flen - 4)
    out = frame * n_frames
    if id3:
        body = b"\x00" * 54
        tag = (b"ID3\x04\x00\x00"
               + bytes([(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                        (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body)
        out = tag + out + b"TAG" + b"\x00" * 125
    return out

"""Deterministic synthetic clips + transcripts source.

Mirrors the reference's seeded fixture generator (`data/log_generator.py:16-83`
— seeded normal/anomaly split) for the graft's audio input contract
(FIXTURES.md §1): every defect is planted at a known seeded rate so every
check has a known-answer fixture. Fully Spark-native: rows derive *only*
from their global index ``i`` (splitmix64 hash streams), so output is
identical at any parallelism — required for cross-parallelism verdict
stability (SURVEY.md §7.3).

Generation is two-phase so the metadata table is cheap (no PCM synth) and
the drift planting can key off the engine's own partition id:

1. ``clips_meta`` — mapInPandas over ``spark.range``: all non-binary columns.
2. ``part_id = pmod(xxhash64(clip_id), P)`` added in Spark (JVM-side).
3. ``with_audio`` — second mapInPandas synthesizes WAV bytes; designated
   drift partitions get a shifted sine-frequency distribution so PSI/KS
   must flag exactly those partitions (FIXTURES.md §1c).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.adpcm import encode_adpcm
from ..functions.audio import encode_wav
from ..functions.flac import encode_flac
from ..functions.g711 import encode_alaw, encode_mulaw

# codec label → real encoder where one ships in-container; anything else
# (incl. the fake-decoded opus/mp3 labels and unknown codecs) is WAV-framed
_ENCODERS = {
    "flac": encode_flac,
    "mulaw": encode_mulaw,
    "alaw": encode_alaw,
    "adpcm_ima": encode_adpcm,
}

# ------------------------------------------------- deterministic hash streams

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — the per-row PRNG."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _stream(i: np.ndarray, tag: int, seed: int) -> np.ndarray:
    """uint64 hash stream for row indices `i`, independent per (tag, seed)."""
    base = (i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & _MASK
    mix = (tag * 0xA24BAED4963EE407 + seed) & 0xFFFFFFFFFFFFFFFF
    return _splitmix64(base ^ np.uint64(mix))


def _u01(i: np.ndarray, tag: int, seed: int) -> np.ndarray:
    """Uniform [0,1) doubles from the hash stream."""
    return (_stream(i, tag, seed) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_VOCAB = np.array(
    "the quick spark clip audio sound wave noise signal speech word test "
    "hello data table row batch stream codec sample rate frame mel filter "
    "check valid drift stat count group join key value".split()
)

_SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000], dtype=np.int64)
_SR_WEIGHTS = np.array([0.10, 0.55, 0.10, 0.15, 0.10])
_CODECS = np.array(
    ["pcm_s16le", "flac", "mulaw", "alaw", "adpcm_ima", "opus", "mp3"]
)
# intentionally skewed (pcm dominates) — the salted group-by tests need a
# heavy key; opus+mp3 stay at a combined 8% (the only fake-decoded labels)
_CODEC_WEIGHTS = np.array([0.55, 0.12, 0.10, 0.07, 0.08, 0.05, 0.03])


def _weighted_pick(u: np.ndarray, choices: np.ndarray, weights: np.ndarray):
    return choices[np.searchsorted(np.cumsum(weights / weights.sum()), u, side="right").clip(0, len(choices) - 1)]


def _transcript_words(i: np.ndarray, n_words: np.ndarray, seed: int) -> list[str]:
    out = []
    for idx, n in zip(i, n_words):
        ws = _stream(np.arange(int(n), dtype=np.uint64) + np.uint64(int(idx) << 20), 7, seed)
        out.append(" ".join(_VOCAB[(ws % np.uint64(len(_VOCAB))).astype(int)]))
    return out


# --------------------------------------------------------------- phase 1: meta

DEFECT_RATES = {
    "dup_clip_id": 0.001,
    "sr_null": 0.002,
    "sr_out_of_range": 0.001,
    "dur_null": 0.002,
    "dur_negative": 0.0005,
    "codec_unknown": 0.001,
    "transcript_null": 0.003,
    "bytes_truncated": 0.0005,
    # payload-quality defects (decoded-PCM rules R063/R064/R065): clipped
    # waveform, near-silent clip, DC-offset bias
    "audio_clipped": 0.0015,
    "audio_silent": 0.0015,
    "audio_dc": 0.001,
    # upsample contamination (R066): content brick-wall lowpassed at sr/4,
    # i.e. half-rate audio resold at the declared rate. Planted on every
    # codec; detectability is codec-physics (PCM/FLAC/G.711 yes, ADPCM's
    # own quantization floor masks it, fake-decoded opus/mp3 never carry
    # the planted spectrum) — the R066 test accounts for exactly that.
    "audio_upsampled": 0.0015,
}


def clips_meta(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    dur_min_ms: int = 200,
    dur_max_ms: int = 2000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Metadata-only clips table (bytes column absent) — cheap at any scale."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy()
            # clip_id with planted duplicates: dup rows copy neighbor's id
            dup = (_u01(i, 1, seed) < DEFECT_RATES["dup_clip_id"]) & (i > 0)
            src = np.where(dup, i - 1, i)
            clip_id = np.char.add("clip_", np.char.zfill(src.astype(str), 12))

            sr = _weighted_pick(_u01(i, 2, seed), _SR_CHOICES, _SR_WEIGHTS).astype("float64")
            oor = _u01(i, 3, seed) < DEFECT_RATES["sr_out_of_range"]
            sr[oor] = np.where(_u01(i, 4, seed)[oor] < 0.5, 0, 96001)
            sr[_u01(i, 5, seed) < DEFECT_RATES["sr_null"]] = np.nan

            # log-uniform duration
            lo, hi = np.log(dur_min_ms), np.log(dur_max_ms)
            dur = np.exp(lo + (hi - lo) * _u01(i, 6, seed))
            dur = dur.round()
            dur[_u01(i, 8, seed) < DEFECT_RATES["dur_negative"]] *= -1
            dur[_u01(i, 9, seed) < DEFECT_RATES["dur_null"]] = np.nan

            codec = _weighted_pick(_u01(i, 10, seed), _CODECS, _CODEC_WEIGHTS).astype(object)
            codec[_u01(i, 11, seed) < DEFECT_RATES["codec_unknown"]] = "vorbis??"

            n_words = np.maximum((np.nan_to_num(dur, nan=500.0) / 300.0), 1).astype(int)
            transcript = np.array(_transcript_words(i, n_words, seed), dtype=object)
            tnull = _u01(i, 12, seed) < DEFECT_RATES["transcript_null"]
            transcript[tnull] = None

            yield pd.DataFrame(
                {
                    "idx": i,
                    "clip_id": clip_id,
                    "sr_hz": pd.array(np.where(np.isnan(sr), None, sr), dtype="Int32"),
                    "dur_ms": pd.array(np.where(np.isnan(dur), None, dur), dtype="Int32"),
                    "codec": codec,
                    "transcript": transcript,
                }
            )

    rng = spark.range(0, n, numPartitions=num_partitions)
    out_schema = (
        "idx long, clip_id string, sr_hz int, dur_ms int, codec string, transcript string"
    )
    return rng.mapInPandas(gen, schema=out_schema)


def with_part_id(df: DataFrame, num_parts: int = 64) -> DataFrame:
    """Engine partition key: data-derived (NOT spark_partition_id) so verdicts
    are stable across parallelism levels (SURVEY.md §7.3)."""
    return df.withColumn("part_id", F.pmod(F.xxhash64("clip_id"), F.lit(num_parts)).cast("int"))


# -------------------------------------------------------------- phase 2: audio


def with_audio(
    meta: DataFrame,
    seed: int = 42,
    drift_parts: tuple[int, ...] = (7, 21),
    max_samples: int = 1 << 17,  # covers 48 kHz × 2000 ms; cap only guards runaway durs
) -> DataFrame:
    """Add `bytes` derived from (idx, part_id). Drifted partitions use a
    shifted sine-frequency band (1500–3000 Hz vs 100–1000 Hz), so spectral
    feature histograms diverge and the drift check must flag exactly them.

    Container matches the codec label where a real in-container codec
    exists: ``codec='flac'`` rows carry genuine FLAC streams (verbatim
    subframes — decoded PCM is sample-identical to the WAV path, so feature
    statistics are codec-invariant); ``mulaw``/``alaw`` rows carry real
    G.711 WAV streams (8-bit log PCM, ≈37 dB round-trip) and ``adpcm_ima``
    rows real IMA ADPCM WAV streams (4-bit, codec-inherent 15–29 dB
    round-trip on these signals); everything else (pcm_s16le, the
    fake-decoded opus/mp3, unknown codecs) is RIFF/WAV-framed 16-bit."""
    cols = meta.columns
    if "part_id" not in cols:
        raise ValueError("call with_part_id() before with_audio()")
    drift = set(int(p) for p in drift_parts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes: list[bytes | None] = []
            i_arr = pdf["idx"].to_numpy()
            u_freq = _u01(i_arr, 20, seed)
            u_amp = 0.3 + 0.4 * _u01(i_arr, 21, seed)
            u_trunc = _u01(i_arr, 22, seed) < DEFECT_RATES["bytes_truncated"]
            u_clip = _u01(i_arr, 25, seed) < DEFECT_RATES["audio_clipped"]
            u_sil = _u01(i_arr, 26, seed) < DEFECT_RATES["audio_silent"]
            u_dc = _u01(i_arr, 27, seed) < DEFECT_RATES["audio_dc"]
            u_ups = _u01(i_arr, 28, seed) < DEFECT_RATES["audio_upsampled"]
            for row_n, (idx, sr, dur, part, codec) in enumerate(
                zip(i_arr, pdf["sr_hz"], pdf["dur_ms"], pdf["part_id"], pdf["codec"])
            ):
                sr_i = int(sr) if pd.notna(sr) and int(sr) > 0 else 16000
                dur_i = int(dur) if pd.notna(dur) and int(dur) > 0 else 500
                ns = min(int(sr_i * dur_i / 1000.0), max_samples)
                if int(part) in drift:
                    freq = 1500.0 + 1500.0 * u_freq[row_n]
                else:
                    freq = 100.0 + 900.0 * u_freq[row_n]
                t = np.arange(max(ns, 16), dtype=np.float64) / sr_i
                rng = np.random.Generator(np.random.Philox(key=int(idx) + seed))
                pcm = u_amp[row_n] * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))
                # planted payload-quality defects (R063/R064/R065/R066): the
                # encoder's int16 clamp turns the 4× gain into flat tops
                if u_clip[row_n]:
                    pcm = pcm * 4.0
                elif u_sil[row_n]:
                    pcm = pcm * 0.0005
                elif u_dc[row_n]:
                    pcm = pcm * 0.5 + 0.4
                elif u_ups[row_n]:
                    # half-rate content at the declared rate: brick-wall
                    # lowpass at sr/4 (what a naive 2× upsample leaves)
                    sp = np.fft.rfft(pcm)
                    fgrid = np.fft.rfftfreq(len(pcm), 1.0 / sr_i)
                    pcm = np.fft.irfft(sp * (fgrid < sr_i / 4.0), n=len(pcm))
                enc = _ENCODERS.get(codec, encode_wav)
                buf = enc(pcm.astype(np.float32), sr_i)
                if u_trunc[row_n]:
                    buf = buf[: max(len(buf) // 2, 20)]
                out_bytes.append(buf)
            pdf = pdf.copy()
            pdf["bytes"] = pd.Series(out_bytes, index=pdf.index, dtype=object)
            yield pdf

    out_schema = ", ".join(
        {
            "idx": "idx long",
            "clip_id": "clip_id string",
            "sr_hz": "sr_hz int",
            "dur_ms": "dur_ms int",
            "codec": "codec string",
            "transcript": "transcript string",
            "part_id": "part_id int",
        }[c]
        for c in cols
    ) + ", bytes binary"
    return meta.mapInPandas(gen, schema=out_schema)


def clips_table(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    num_parts: int = 64,
    with_bytes: bool = True,
    drift_parts: tuple[int, ...] = (7, 21),
    num_partitions: int | None = None,
    dur_min_ms: int = 200,
    dur_max_ms: int = 2000,
) -> DataFrame:
    """Full synthetic clips table in the input_hint contract (+ idx, part_id)."""
    meta = with_part_id(
        clips_meta(spark, n, seed=seed, num_partitions=num_partitions,
                   dur_min_ms=dur_min_ms, dur_max_ms=dur_max_ms),
        num_parts,
    )
    if with_bytes:
        max_samples = max(1 << 17, 96_000 * dur_max_ms // 1000 + 1)
        return with_audio(meta, seed=seed, drift_parts=drift_parts, max_samples=max_samples)
    return meta


def transcripts_table(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Normalized transcript side table (FIXTURES.md §1b): ~0.2% of clips
    missing here, ~0.2% orphan rows, ~0.1% transcript mismatches."""
    meta = clips_meta(spark, n, seed=seed).select("idx", "clip_id", "transcript")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["idx"].to_numpy()
            keep = _u01(i, 30, seed) >= 0.002  # drop → "missing transcript" violations
            mismatch = _u01(i, 31, seed) < 0.001
            orphan = _u01(i, 32, seed) < 0.002  # extra row with unknown clip_id
            pdf = pdf.copy()
            tr = pdf["transcript"].to_numpy(dtype=object)
            tr[mismatch] = [None if t is None else t + " MUTATED" for t in tr[mismatch]]
            pdf["transcript"] = tr
            langs = np.array(["en", "de", "fr", "es"], dtype=object)
            pdf["lang"] = langs[(_stream(i, 33, seed) % np.uint64(4)).astype(int)]
            base = pdf.loc[keep, ["clip_id", "transcript", "lang"]]
            orphans = pdf.loc[orphan, ["transcript", "lang"]].copy()
            orphans["clip_id"] = [
                f"orphan_{int(x):012d}" for x in i[orphan]
            ]
            yield pd.concat([base, orphans[["clip_id", "transcript", "lang"]]])

    return meta.mapInPandas(gen, schema="clip_id string, transcript string, lang string")


# --------------------------------------------- acoustic content-dup corpus

_DUP_CODECS = np.array(
    ["pcm_s16le", "flac", "mulaw", "alaw", "adpcm_ima"], dtype=object
)


def content_dup_clips(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    dup_rate: float = 0.4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Planted-ground-truth corpus for acoustic content-dup detection
    (operators/audio_dedup.py): every clip is a 15-segment random "melody"
    (segment tone drawn from 16 log-spaced bands) + per-row noise; odd
    rows duplicate their left neighbor's CONTENT with probability
    ``dup_rate`` — same melody, DIFFERENT codec, DIFFERENT noise
    realization and an independently drawn SAMPLE RATE (16 kHz or 8 kHz,
    so ~half the planted pairs also cross rates), so byte- and
    transcript-level dedup cannot find the pair and only a rate-invariant
    acoustic match can. All five real codecs are exercised.

    The signal is a pure function of ``content_key`` (no cross-row data
    dependency, so generation stays embarrassingly parallel), the planted
    pair set is exactly {(idx-1, idx) : is_dup} — no transitive chains
    (only even rows are sources, only odd rows are dups), which keeps the
    expected-pair oracle exact. Columns: idx, clip_id, codec, sr_hz,
    dur_ms, bytes, is_dup, src_clip_id (null for non-dups).
    """
    n_segs = 15
    bands = np.geomspace(200.0, 3800.0, 16)
    sr_choices = (16000, 8000)  # 1 s clips at either rate

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import encode_wav as _wav

        ts = {r: np.arange(r, dtype=np.float64) / r for r in sr_choices}
        for pdf in batches:
            i = pdf["id"].to_numpy()
            is_dup = (i % 2 == 1) & (_u01(i, 60, seed) < dup_rate)
            sr_row = np.where(
                (_stream(i, 63, seed) % np.uint64(2)) == 0,
                sr_choices[0], sr_choices[1],
            )
            content = np.where(is_dup, i - 1, i).astype(np.uint64)
            codec_i = (_stream(i, 61, seed) % np.uint64(5)).astype(int)
            # dup rows force a codec different from their source's draw
            src_codec = (_stream(content, 61, seed) % np.uint64(5)).astype(int)
            bump = 1 + (_stream(i, 62, seed) % np.uint64(4)).astype(int)
            codec_i = np.where(is_dup, (src_codec + bump) % 5, codec_i)
            # melody: per-(content, segment) band index
            seg_bands = np.stack(
                [(_stream(content, 50 + k, seed) % np.uint64(16)).astype(int)
                 for k in range(n_segs)],
                axis=1,
            )
            out_bytes: list[bytes] = []
            for r in range(len(i)):
                sr_r = int(sr_row[r])
                n_samp = sr_r  # 1 s
                seg_len = n_samp // n_segs
                t = ts[sr_r]
                sig = np.zeros(n_samp)
                for k in range(n_segs):
                    sl = slice(k * seg_len, (k + 1) * seg_len if k < n_segs - 1 else n_samp)
                    sig[sl] = 0.5 * np.sin(2 * np.pi * bands[seg_bands[r, k]] * t[sl])
                rng = np.random.Generator(np.random.Philox(key=int(i[r]) + seed))
                sig += 0.02 * rng.standard_normal(n_samp)
                enc = _ENCODERS.get(_DUP_CODECS[codec_i[r]], _wav)
                out_bytes.append(enc(sig.astype(np.float32), sr_r))
            yield pd.DataFrame(
                {
                    "idx": i,
                    "clip_id": np.char.add("a", np.char.zfill(i.astype(str), 10)),
                    "codec": _DUP_CODECS[codec_i],
                    "sr_hz": sr_row.astype(np.int32),
                    "dur_ms": np.full(len(i), 1000, dtype=np.int32),
                    "bytes": pd.Series(out_bytes, dtype=object),
                    "is_dup": is_dup,
                    "src_clip_id": pd.Series(
                        np.where(
                            is_dup,
                            np.char.add("a", np.char.zfill((i - 1).astype(str), 10)),
                            None,
                        ),
                        dtype=object,
                    ),
                }
            )

    rng = spark.range(0, n, numPartitions=num_partitions)
    schema = (
        "idx long, clip_id string, codec string, sr_hz int, dur_ms int,"
        " bytes binary, is_dup boolean, src_clip_id string"
    )
    return rng.mapInPandas(gen, schema=schema)


# --------------------------------------------------- VAD ground-truth corpus

def burst_clips(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Planted-ground-truth corpus for speech segmentation
    (operators/segment.py): every clip is 3 s of digital silence with
    1-3 tone bursts at exactly known offsets (deterministic in idx), so
    a VAD's detected segments can be asserted against the planted
    schedule. Bursts are >=300 ms, separated by >=400 ms (above the
    default min_speech/min_gap), amplitude 0.5 at -6 dBFS against TRUE
    zero silence; codec rotates through the lossless/real set with a
    known noise character (pcm/flac bit-exact; mulaw ~37 dB SNR).
    Columns: idx, clip_id, codec, sr_hz, dur_ms, bytes,
    bursts array<struct<start_s double, end_s double>>."""
    codecs = np.array(["pcm_s16le", "flac", "mulaw"], dtype=object)
    base_sched = [(0.3, 0.8), (1.4, 1.9), (2.3, 2.7)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import encode_wav as _wav

        for pdf in batches:
            i = pdf["id"].to_numpy()
            n_bursts = 1 + (_stream(i, 70, seed) % np.uint64(3)).astype(int)
            codec_i = (_stream(i, 71, seed) % np.uint64(3)).astype(int)
            jit = (_stream(i, 72, seed) % np.uint64(8)).astype(int) * 0.01
            freq = 440.0 + 40.0 * (_stream(i, 73, seed) % np.uint64(12)).astype(int)
            sr = 16000
            t = np.arange(3 * sr, dtype=np.float64) / sr
            rows = []
            for r in range(len(i)):
                sig = np.zeros(3 * sr)
                sched = []
                for k in range(int(n_bursts[r])):
                    t0 = base_sched[k][0] + float(jit[r])
                    t1 = base_sched[k][1] + float(jit[r])
                    s0, s1 = int(t0 * sr), int(t1 * sr)
                    sig[s0:s1] = 0.5 * np.sin(2 * np.pi * freq[r] * t[s0:s1])
                    sched.append({"start_s": round(t0, 4), "end_s": round(t1, 4)})
                enc = _ENCODERS.get(codecs[codec_i[r]], _wav)
                rows.append({
                    "idx": int(i[r]),
                    "clip_id": f"b{int(i[r]):010d}",
                    "codec": codecs[codec_i[r]],
                    "sr_hz": sr,
                    "dur_ms": 3000,
                    "bytes": enc(sig.astype(np.float32), sr),
                    "bursts": sched,
                })
            yield pd.DataFrame(rows)

    rng = spark.range(0, n, numPartitions=num_partitions)
    schema = (
        "idx long, clip_id string, codec string, sr_hz int, dur_ms int,"
        " bytes binary,"
        " bursts array<struct<start_s double, end_s double>>"
    )
    return rng.mapInPandas(gen, schema=schema)


# ------------------------------------------------ snippet-search corpus

def melody_clips(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    dur_s: float = 8.0,
    note_ms: int = 250,
    num_partitions: int | None = None,
) -> DataFrame:
    """Long-melody corpus for audio snippet search
    (operators/audio_search.py): each clip is ``dur_s`` seconds of
    ``note_ms`` random tones from the 16 log-spaced fingerprint bands
    (deterministic in idx) + per-row noise, 16 kHz, rotating through the
    real codec set. Tests cut snippets from decoded clips at arbitrary
    (non-grid-aligned) offsets and re-encode them to assert retrieval.
    Columns: idx, clip_id, codec, sr_hz, dur_ms, bytes."""
    bands = np.geomspace(200.0, 3800.0, 16)
    codecs = np.array(["pcm_s16le", "flac", "mulaw", "adpcm_ima"], dtype=object)
    sr = 16000
    n_samp = int(dur_s * sr)
    note_len = int(note_ms * sr / 1000.0)
    n_notes = (n_samp + note_len - 1) // note_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import encode_wav as _wav

        t = np.arange(n_samp, dtype=np.float64) / sr
        for pdf in batches:
            i = pdf["id"].to_numpy()
            codec_i = (_stream(i, 80, seed) % np.uint64(4)).astype(int)
            notes = np.stack(
                [(_stream(i, 81 + k, seed) % np.uint64(16)).astype(int)
                 for k in range(n_notes)],
                axis=1,
            )
            rows = []
            for r in range(len(i)):
                sig = np.zeros(n_samp)
                for k in range(n_notes):
                    sl = slice(k * note_len, min((k + 1) * note_len, n_samp))
                    sig[sl] = 0.5 * np.sin(2 * np.pi * bands[notes[r, k]] * t[sl])
                rng = np.random.Generator(np.random.Philox(key=int(i[r]) + seed))
                sig += 0.02 * rng.standard_normal(n_samp)
                enc = _ENCODERS.get(codecs[codec_i[r]], _wav)
                rows.append({
                    "idx": int(i[r]),
                    "clip_id": f"m{int(i[r]):010d}",
                    "codec": codecs[codec_i[r]],
                    "sr_hz": sr,
                    "dur_ms": int(dur_s * 1000),
                    "bytes": enc(sig.astype(np.float32), sr),
                })
            yield pd.DataFrame(rows)

    rng = spark.range(0, n, numPartitions=num_partitions)
    schema = ("idx long, clip_id string, codec string, sr_hz int,"
              " dur_ms int, bytes binary")
    return rng.mapInPandas(gen, schema=schema)


# ------------------------------------------------ pitch ground-truth corpus

# Bump whenever pitch_clips' planted content changes for the same (n, seed):
# the xq/q58 oracle export path is keyed on this, so a stale export from an
# older fixture can never be read by a newer harness run.
PITCH_FIXTURE_VERSION = 2


def pitch_clips(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Planted-ground-truth corpus for the pitch profile
    (operators/features.py::pitch_features): four deterministic classes
    cycled by idx % 4 —

      tone    — pure sine at a known, log-spaced F0 in [55, 440) Hz
                (the "synthetic tone / line hum" contamination class:
                voiced, flat pitch line, spread ≈ 0; the band starts
                below 65 Hz on purpose — 50/60 Hz mains hum is the
                canonical real-world member, and the round-5 taper
                fix in functions/audio.py::frame_f0 is exercised here)
      glide   — linear F0 ramp f→2f with f in [100, 200] Hz
                (the speech-like wandering track: voiced, wide IQR)
      noise   — white gaussian at 0.1 RMS (unvoiced)
      silence — true digital zero (unvoiced)

    Codec rotates through all five real codecs and the sample rate is an
    independent 8 kHz / 16 kHz draw, so the expected per-clip verdict is
    codec- and rate-invariant ground truth. Columns: idx, clip_id, codec,
    sr_hz, dur_ms, bytes, cls, f0_true (NULL for non-tones)."""
    sr_choices = (16000, 8000)
    classes = np.array(["tone", "glide", "noise", "silence"], dtype=object)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import encode_wav as _wav

        for pdf in batches:
            i = pdf["id"].to_numpy()
            cls_i = (i % 4).astype(int)
            sr_row = np.where(
                (_stream(i, 80, seed) % np.uint64(2)) == 0,
                sr_choices[0], sr_choices[1],
            )
            codec_i = (_stream(i, 81, seed) % np.uint64(5)).astype(int)
            f_tone = 55.0 * np.power(8.0, _u01(i, 82, seed))      # [55, 440)
            f_glide = 100.0 * np.power(2.0, _u01(i, 83, seed))    # [100, 200)
            out_bytes: list[bytes] = []
            f0_true: list[float | None] = []
            for r in range(len(i)):
                sr_r = int(sr_row[r])
                t = np.arange(sr_r, dtype=np.float64) / sr_r      # 1 s
                c = cls_i[r]
                if c == 0:
                    sig = 0.4 * np.sin(2 * np.pi * f_tone[r] * t)
                    f0_true.append(round(float(f_tone[r]), 4))
                elif c == 1:
                    f_inst = f_glide[r] * (1.0 + t)               # f -> 2f
                    sig = 0.4 * np.sin(2 * np.pi * np.cumsum(f_inst) / sr_r)
                    f0_true.append(None)
                elif c == 2:
                    rng_r = np.random.Generator(
                        np.random.Philox(key=int(i[r]) + seed))
                    sig = 0.1 * rng_r.standard_normal(sr_r)
                    f0_true.append(None)
                else:
                    sig = np.zeros(sr_r)
                    f0_true.append(None)
                enc = _ENCODERS.get(_DUP_CODECS[codec_i[r]], _wav)
                out_bytes.append(enc(sig.astype(np.float32), sr_r))
            yield pd.DataFrame(
                {
                    "idx": i,
                    "clip_id": np.char.add("p", np.char.zfill(i.astype(str), 10)),
                    "codec": _DUP_CODECS[codec_i],
                    "sr_hz": sr_row.astype(np.int32),
                    "dur_ms": np.full(len(i), 1000, dtype=np.int32),
                    "bytes": pd.Series(out_bytes, dtype=object),
                    "cls": classes[cls_i],
                    "f0_true": pd.array(f0_true, dtype="Float64"),
                }
            )

    rng = spark.range(0, n, numPartitions=num_partitions)
    schema = ("idx long, clip_id string, codec string, sr_hz int,"
              " dur_ms int, bytes binary, cls string, f0_true double")
    return rng.mapInPandas(gen, schema=schema)


# ------------------------------------------------ stereo ground-truth corpus

def _twin_signal(idx: int, sr: int, f_base: float, seed: int) -> np.ndarray:
    """One second of the twin fixtures' shared signal model: tone /
    speech-like glide+noise / noise by ``idx % 3``, Philox-keyed on
    ``idx * 2 (+1) + seed``. The stereo and packed-FLAC twin corpora draw
    from THIS one function so a tweak to the model can never silently
    desynchronize the two planted corpora."""
    t = np.arange(sr, dtype=np.float64) / sr  # 1 s
    kind = idx % 3
    if kind == 0:
        return 0.35 * np.sin(2 * np.pi * f_base * t)
    if kind == 1:
        f_inst = f_base * (1.0 + 0.8 * t)
        rng = np.random.Generator(np.random.Philox(key=idx * 2 + seed))
        return (0.3 * np.sin(2 * np.pi * np.cumsum(f_inst) / sr)
                + 0.03 * rng.standard_normal(sr))
    rng = np.random.Generator(np.random.Philox(key=idx * 2 + 1 + seed))
    return 0.1 * rng.standard_normal(sr)


def stereo_twin_clips(
    spark: SparkSession,
    n_pairs: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Planted stereo/mono twin corpus for the round-5 downmix decode.

    Emits ``2 * n_pairs`` rows: for each pair index a MONO clip and a
    STEREO clip whose two channels are both exactly the mono signal, so
    the decode-time downmix (mean of channels, computed on the raw int16
    samples) must produce bit-identical PCM — and therefore bit-identical
    outputs from every payload operator (fingerprints, VAD segments,
    pitch, MFCC drift features...). Content alternates tone / speech-like
    (glide+noise) / noise by idx % 3; codec alternates the two
    channel-bearing containers ``pcm_s16le`` / ``flac``; sample rate is an
    independent 8 kHz / 16 kHz draw. Columns: idx, pair_id, layout
    ('mono'|'stereo'), clip_id, codec, sr_hz, dur_ms, bytes.
    """
    sr_choices = (16000, 8000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import encode_wav as _wav
        from ..functions.flac import encode_flac as _flac

        for pdf in batches:
            i = pdf["id"].to_numpy()
            sr_row = np.where(
                (_stream(i, 90, seed) % np.uint64(2)) == 0,
                sr_choices[0], sr_choices[1],
            )
            f_base = 80.0 * np.power(4.0, _u01(i, 91, seed))  # [80, 320)
            rows: list[dict] = []
            for r in range(len(i)):
                idx = int(i[r])
                sr_r = int(sr_row[r])
                sig = _twin_signal(idx, sr_r, float(f_base[r]), seed)
                sig32 = sig.astype(np.float32)
                stereo = np.stack([sig32, sig32], axis=1)
                codec = "pcm_s16le" if idx % 2 == 0 else "flac"
                enc = _wav if codec == "pcm_s16le" else _flac
                for layout, payload in (("mono", sig32), ("stereo", stereo)):
                    rows.append({
                        "idx": idx,
                        "pair_id": f"t{idx:08d}",
                        "layout": layout,
                        "clip_id": f"t{idx:08d}_{layout}",
                        "codec": codec,
                        "sr_hz": sr_r,
                        "dur_ms": 1000,
                        "bytes": enc(payload, sr_r),
                    })
            yield pd.DataFrame(rows)

    rng = spark.range(0, n_pairs, numPartitions=num_partitions)
    schema = ("idx long, pair_id string, layout string, clip_id string,"
              " codec string, sr_hz int, dur_ms int, bytes binary")
    return rng.mapInPandas(gen, schema=schema)


def packed_flac_twin_clips(
    spark: SparkSession,
    n_pairs: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Planted verbatim/bit-packed FLAC twin corpus for the round-5 full
    decoder.

    Emits ``2 * n_pairs`` rows: for each pair index the SAME signal encoded
    once with the byte-aligned VERBATIM layout (the decoder's fast path)
    and once with ``compression="fixed"`` (FIXED prediction + Rice
    residuals — the bit engine). Decoded PCM is bit-identical by
    construction (same int16 quantization), so every payload operator must
    produce bit-identical outputs for the two layouts. Even pair indices
    are mono; odd ones are stereo with the four channel assignments
    cycling (independent / left-side / right-side / mid-side) on the
    packed side — the verbatim side of a stereo pair uses independent
    stereo, the only assignment that layout supports. Columns: idx,
    pair_id, layout ('verbatim'|'packed'), clip_id, codec, sr_hz, dur_ms,
    bytes.
    """
    sr_choices = (16000, 8000)
    modes = ("independent", "left-side", "right-side", "mid-side")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.flac import encode_flac as _flac

        for pdf in batches:
            i = pdf["id"].to_numpy()
            sr_row = np.where(
                (_stream(i, 94, seed) % np.uint64(2)) == 0,
                sr_choices[0], sr_choices[1],
            )
            f_base = 80.0 * np.power(4.0, _u01(i, 95, seed))  # [80, 320)
            rows: list[dict] = []
            for r in range(len(i)):
                idx = int(i[r])
                sr_r = int(sr_row[r])
                sig = _twin_signal(idx, sr_r, float(f_base[r]), seed)
                sig32 = sig.astype(np.float32)
                if idx % 2 == 0:
                    payload = sig32
                else:
                    rng_r = np.random.Generator(
                        np.random.Philox(key=idx * 3 + seed))
                    other = (0.7 * sig + 0.02 * rng_r.standard_normal(sr_r))
                    payload = np.stack(
                        [sig32, other.astype(np.float32)], axis=1)
                vb = _flac(payload, sr_r)
                pk = _flac(payload, sr_r, compression="fixed",
                           stereo_mode=modes[(idx // 2) % 4]
                           if idx % 2 else "independent")
                for layout, b in (("verbatim", vb), ("packed", pk)):
                    rows.append({
                        "idx": idx,
                        "pair_id": f"p{idx:08d}",
                        "layout": layout,
                        "clip_id": f"p{idx:08d}_{layout}",
                        "codec": "flac",
                        "sr_hz": sr_r,
                        "dur_ms": 1000,
                        "bytes": b,
                    })
            yield pd.DataFrame(rows)

    rng = spark.range(0, n_pairs, numPartitions=num_partitions)
    schema = ("idx long, pair_id string, layout string, clip_id string,"
              " codec string, sr_hz int, dur_ms int, bytes binary")
    return rng.mapInPandas(gen, schema=schema)

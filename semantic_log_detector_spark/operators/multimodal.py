"""Multimodal binary-column plumbing: typed opaque payloads + Arrow-UDF
feature extraction.

Audio is this engine's *real* payload (functions/audio.py decodes WAV and
extracts MFCC for the drift check). Image/video payloads get the same
Spark-side plumbing — schema, partitioning, vectorized UDF signature, batch
shape — with the codec-specific decode STUBBED: the decode libraries
(Pillow/ffmpeg) are not in this container. `fake_decode=True` substitutes a
deterministic payload-derived feature vector so the distributed plumbing is
fully testable; `fake_decode=False` raises NotImplementedError at the
decode seam, which is exactly where a real decoder drops in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int, "
    "n_frames int, meta map<string,string>"
)

_FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode→feature: bytes → 8 floats."""
    d = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(d[:32], dtype=np.uint8).reshape(_FEATURE_DIM, 4).sum(axis=1)
            / 1020.0).astype(np.float64)


def _audio_feature(payload: bytes) -> np.ndarray:
    """REAL audio decode → 8 features: duration_s, rms, peak, zero-crossing
    rate, and 4 geometric-band spectral energy fractions. This is the live
    end of the X2/X3 model-predict seam for the modalities this engine owns
    (WAV via functions/audio.py, FLAC via functions/flac.py, dispatched on
    container magic); image/video stay stubbed."""
    from ..functions.audio import decode_wav
    from ..functions.flac import decode_flac

    dec = decode_flac if payload[:4] == b"fLaC" else decode_wav
    pcm, sr = dec(payload)
    if pcm.size == 0:
        raise ValueError("empty pcm")
    pcm = pcm.astype(np.float64)
    dur = pcm.size / sr
    rms = float(np.sqrt(np.mean(pcm * pcm)))
    peak = float(np.max(np.abs(pcm)))
    # single-sample clip: no transitions to rate (mean of empty → NaN)
    zcr = (
        float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))
        if pcm.size > 1 else 0.0
    )
    power = np.abs(np.fft.rfft(pcm)) ** 2
    total = float(power.sum()) or 1.0
    # 4 geometric bands over the positive spectrum (edges at n/8, n/4, n/2)
    n = power.size
    edges = (0, max(1, n // 8), max(2, n // 4), max(3, n // 2), n)
    bands = [float(power[edges[i]:edges[i + 1]].sum()) / total for i in range(4)]
    return np.array([dur, rms, peak, zcr, *bands], dtype=np.float64)


def extract_media_features(
    df: DataFrame,
    kind_col: str = "kind",
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake_decode: bool = True,
) -> DataFrame:
    """mapInPandas: (id, kind, payload) → (id, kind, ok, real, err, features).

    kind='audio' with a RIFF/WAV or fLaC payload is decoded FOR REAL
    (functions/audio.py, functions/flac.py) and featurized — `real=True` marks those rows, so
    fake-featured rows are never silently indistinguishable (same honesty
    contract as the codec registry). Image/video decode drops in at the
    NotImplementedError (Pillow/ffmpeg are not in this container), keeping
    this exact signature and batch shape. Partitioning/pruning behavior
    matches the audio path: callers select only the columns they need,
    payloads stream through Arrow batches and are never cached.
    """
    cols = [id_col, kind_col, payload_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            real = np.zeros(n, dtype=bool)
            err = np.empty(n, dtype=object)
            feats = np.empty(n, dtype=object)
            for i, (payload, kind) in enumerate(zip(pdf[payload_col], pdf[kind_col])):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    buf = bytes(payload)
                    if kind == "audio" and buf[:4] in (b"RIFF", b"fLaC"):
                        feats[i] = _audio_feature(buf)
                        ok[i] = real[i] = True
                        continue
                    if not fake_decode:
                        raise NotImplementedError(
                            f"no in-container decoder for kind={kind!r}; "
                            "swap _fake_feature for a real decode here"
                        )
                    feats[i] = _fake_feature(buf)
                    ok[i] = True
                except NotImplementedError:
                    raise
                except Exception as e:
                    err[i] = f"{type(e).__name__}: {e}"[:200]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    kind_col: pdf[kind_col],
                    "ok": ok,
                    "real": real,
                    "err": err,
                    "features": feats,
                }
            )

    return df.select(*cols).mapInPandas(
        gen,
        schema=f"{id_col} string, {kind_col} string, ok boolean, real boolean, "
        "err string, features array<double>",
    )


def synth_media(spark, n: int, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("m_"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("video"), F.lit("audio")),
                (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.encode(F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))), "utf-8").alias("payload"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1).alias("n_frames"),
            F.create_map(F.lit("src"), F.lit("synth")).alias("meta"),
        )
    )

"""Deterministic audio augmentation — corpus expansion for training pipelines.

ASR/audio-LM training corpora are routinely expanded with speed
perturbation (the classic 0.9×/1.1× three-way of Kaldi-style recipes),
gain perturbation, additive noise at a target SNR, and loudness
normalization. This operator is the scale version of that recipe: ONE
mapInPandas pass over the clip table decodes each payload once, applies
every requested augmentation, and emits one new row per (clip, spec) with
the augmented payload re-encoded as pcm_s16le WAV — payload bytes never
leave the scan stage, nothing shuffles, and the k× output streams straight
to the sink. (Graft of the reference's feature-noise robustness seam,
src/ids/robustness.py:20-41, onto the raw-audio axis — there the noise
perturbs feature vectors; here it manufactures training variants.)

Everything is a pure function of (clip_id, spec, seed): the noise RNG is
Philox keyed on xxhash64(clip_id | spec name) ^ seed, so the augmented
corpus is bit-identical at any parallelism, partitioning, or retry — the
same determinism contract as the synth corpus and the robustness harness.

No silent drops: clips that fail to decode (or fake-decode, when
``skip_fake``) keep one row per spec with ``ok=false``, null bytes and the
error string, so augmented-corpus accounting always sums to
n_input × n_specs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.sparkhash import xxhash64

# ------------------------------------------------------------ numpy kernels


def speed_perturb(pcm: np.ndarray, factor: float) -> np.ndarray:
    """Resample-based speed change: ``factor`` > 1 is faster (shorter).
    Linear interpolation over the scaled time grid — same interpolator as
    functions/audio.resample_linear, reparameterized by rate ratio."""
    if factor <= 0:
        raise ValueError(f"speed factor must be > 0, got {factor}")
    n = len(pcm)
    if n == 0:
        return pcm.astype(np.float32)
    m = max(int(round(n / factor)), 1)
    src = np.arange(m, dtype=np.float64) * factor
    return np.interp(src, np.arange(n, dtype=np.float64), pcm).astype(np.float32)


def gain(pcm: np.ndarray, db: float) -> np.ndarray:
    """Scalar gain in dB. The WAV encoder's int16 clamp bounds the result;
    pair with rms_normalize first if headroom matters."""
    return (pcm * (10.0 ** (db / 20.0))).astype(np.float32)


def add_noise_snr(pcm: np.ndarray, snr_db: float, key: int) -> np.ndarray:
    """Additive white Gaussian noise at ``snr_db`` below the clip's own RMS,
    deterministically keyed (Philox) — identical output for identical
    (pcm, snr_db, key) anywhere in the cluster."""
    rms = float(np.sqrt(np.mean(np.asarray(pcm, np.float64) ** 2)))
    if rms <= 0 or len(pcm) == 0:
        return np.asarray(pcm, np.float32)
    noise_rms = rms / (10.0 ** (snr_db / 20.0))
    rng = np.random.Generator(np.random.Philox(key=key & 0x7FFFFFFFFFFFFFFF))
    return (pcm + noise_rms * rng.standard_normal(len(pcm))).astype(np.float32)


def rms_normalize(pcm: np.ndarray, target_dbfs: float = -20.0) -> np.ndarray:
    """Scale the clip so its RMS sits at ``target_dbfs`` (dB re full scale).
    Silent input is returned unchanged — there is nothing to normalize and
    inventing gain for digital silence only amplifies the noise floor."""
    rms = float(np.sqrt(np.mean(np.asarray(pcm, np.float64) ** 2)))
    if rms <= 0 or len(pcm) == 0:
        return np.asarray(pcm, np.float32)
    return (pcm * (10.0 ** (target_dbfs / 20.0) / rms)).astype(np.float32)


@dataclass(frozen=True)
class AugSpec:
    """One augmentation: ``kind`` ∈ {speed, gain, noise, rms_norm,
    lufs_norm, resample}; ``name`` suffixes the output clip_id
    (``<clip_id>#<name>``). ``apply`` returns the new pcm, or
    (pcm, new_sr) for kinds that change the sample rate."""

    name: str
    kind: str
    params: dict = field(default_factory=dict)

    def apply(self, pcm: np.ndarray, sr: int, key: int):
        if self.kind == "speed":
            return speed_perturb(pcm, float(self.params["factor"]))
        if self.kind == "resample":
            # rate canonicalization (the mixed-rate corpus → one-rate
            # corpus ingest step); same interpolator the fingerprint and
            # snippet kernels use, so downstream ops see identical audio
            from ..functions.audio import resample_linear

            target = int(self.params["target_hz"])
            if target <= 0:
                raise ValueError(f"target_hz must be > 0, got {target}")
            return resample_linear(
                np.asarray(pcm, np.float32), int(sr), target), target
        if self.kind == "gain":
            return gain(pcm, float(self.params["db"]))
        if self.kind == "noise":
            return add_noise_snr(pcm, float(self.params["snr_db"]), key)
        if self.kind == "rms_norm":
            return rms_normalize(pcm, float(self.params.get("target_dbfs", -20.0)))
        if self.kind == "lufs_norm":
            # BS.1770 integrated-loudness normalization (the broadcast/ASR
            # standard; rms_norm is the cheap cousin). Silence keeps 0 dB
            # gain — same policy as rms_normalize.
            from ..functions.loudness import lufs_gain_db

            g = lufs_gain_db(pcm, sr, float(self.params.get("target_lufs", -23.0)))
            return gain(pcm, g)
        raise ValueError(f"unknown augmentation kind {self.kind!r}")


#: the classic ASR three-way speed perturbation + a light noise variant
DEFAULT_SPECS: tuple[AugSpec, ...] = (
    AugSpec("sp0.9", "speed", {"factor": 0.9}),
    AugSpec("sp1.1", "speed", {"factor": 1.1}),
    AugSpec("n20db", "noise", {"snr_db": 20.0}),
)


# -------------------------------------------------------------- the operator


def augment_clips(
    df: DataFrame,
    specs: tuple[AugSpec, ...] = DEFAULT_SPECS,
    seed: int = 0,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    skip_fake: bool = True,
    passthrough: tuple[str, ...] = ("transcript",),
) -> DataFrame:
    """Expand a clip corpus: one output row per (input clip × spec).

    Output schema: (clip_id, src_clip_id, aug, ok, err, bytes, codec,
    sr_hz, dur_ms[, passthrough…]). Augmented payloads are canonical
    pcm_s16le WAV at the decoded rate (re-encoding into the source codec
    would stack lossy generations); transcripts ride along unchanged —
    speed/gain/noise do not alter words.

    Scale: one decode pass per input clip regardless of len(specs); no
    shuffle; output is len(specs)× the input row count and roughly
    len(specs)× the PCM bytes, so write it straight to a parquet sink —
    never collect. ``skip_fake`` (default) refuses to manufacture training
    variants of fake-decoded payloads (they carry synthetic spectra, not
    the recording) — those rows come back ok=false with err='fake_decode'.
    """
    passthrough = tuple(c for c in passthrough if c in df.columns)
    cols = [id_col, bytes_col, codec_col, *passthrough]

    def gen(batches):
        import pyarrow as pa

        from ..functions.audio import decode_clip_ex, encode_wav, predecode_batch

        for pdf in batches:
            payloads = pdf[bytes_col].tolist()
            codecs = pdf[codec_col].tolist()
            ids = pdf[id_col].astype(str).tolist()
            n = len(payloads)
            pre = predecode_batch(pa.array(payloads, type=pa.binary()), codecs)
            out_rows: dict[str, list] = {
                "clip_id": [], "src_clip_id": [], "aug": [], "ok": [],
                "err": [], "bytes": [], "codec": [], "sr_hz": [], "dur_ms": [],
            }
            pass_vals: dict[str, list] = {c: [] for c in passthrough}

            for i in range(n):
                pcm, sr, err = None, 0, None
                try:
                    hit = pre.get(i)
                    if isinstance(hit, Exception):
                        raise hit
                    if hit is not None:
                        pcm, sr = hit
                        fake = False
                    else:
                        buf = payloads[i]
                        pcm, sr, fake = decode_clip_ex(
                            None if buf is None else bytes(buf), codecs[i])
                    if fake and skip_fake:
                        pcm, err = None, "fake_decode"
                    elif pcm is None or len(pcm) == 0 or sr <= 0:
                        pcm, err = None, "empty_decode"
                except Exception as e:
                    pcm, err = None, f"{type(e).__name__}: {e}"[:200]

                for spec in specs:
                    out_rows["src_clip_id"].append(ids[i])
                    out_rows["clip_id"].append(f"{ids[i]}#{spec.name}")
                    out_rows["aug"].append(spec.name)
                    for c in passthrough:
                        pass_vals[c].append(pdf[c].iloc[i])
                    if pcm is None:
                        out_rows["ok"].append(False)
                        out_rows["err"].append(err)
                        out_rows["bytes"].append(None)
                        out_rows["codec"].append(None)
                        out_rows["sr_hz"].append(None)
                        out_rows["dur_ms"].append(None)
                        continue
                    key = xxhash64(f"{ids[i]}|{spec.name}".encode("utf-8")) ^ (
                        seed & 0xFFFFFFFF)
                    res = spec.apply(np.asarray(pcm, np.float32), sr, key)
                    aug, out_sr = res if isinstance(res, tuple) else (res, sr)
                    out_rows["ok"].append(True)
                    out_rows["err"].append(None)
                    out_rows["bytes"].append(encode_wav(aug, out_sr))
                    out_rows["codec"].append("pcm_s16le")
                    out_rows["sr_hz"].append(out_sr)
                    out_rows["dur_ms"].append(
                        int(round(len(aug) * 1000.0 / out_sr)))

            out = pd.DataFrame({
                "clip_id": out_rows["clip_id"],
                "src_clip_id": out_rows["src_clip_id"],
                "aug": out_rows["aug"],
                "ok": pd.Series(out_rows["ok"], dtype=bool),
                "err": out_rows["err"],
                "bytes": pd.Series(out_rows["bytes"], dtype=object),
                "codec": out_rows["codec"],
                "sr_hz": pd.array(out_rows["sr_hz"], dtype="Int32"),
                "dur_ms": pd.array(out_rows["dur_ms"], dtype="Int32"),
            })
            for c in passthrough:
                out[c] = pd.Series(pass_vals[c], index=out.index)
            yield out

    schema = ("clip_id string, src_clip_id string, aug string, ok boolean,"
              " err string, bytes binary, codec string, sr_hz int, dur_ms int")
    for c in passthrough:
        schema += f", {c} {df.schema[c].dataType.simpleString()}"
    return df.select(*cols).mapInPandas(gen, schema=schema)

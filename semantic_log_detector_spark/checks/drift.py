"""Distribution-drift check over audio features (SURVEY.md A15/W6/X1/X5).

Replaces the reference's semantic-embedding anomaly scorer — Sentence-BERT
kNN distance vs a percentile threshold (`src/detection/anomaly_scorer.py:
38-84`) and the rolling drift monitor (`src/monitoring/drift.py:18-47`) —
with closed-form statistics per the north_star: PSI and two-sample KS over
MFCC/log-mel feature histograms.

Pipeline (ONE Arrow-UDF pass over the payload bytes; tiny shuffles after):

1. ``decode_stats``: a single mapInArrow over (clip_id, part_id, bytes,
   codec, sr_hz, dur_ms) that decodes, feature-extracts, bins features into
   per-batch fixed-bin histogram partials (hand-rolled map-side combine),
   and emits R060 decode / R061 duration violations inline. Bytes are read
   exactly once; nothing per-clip leaves the stage except sparse violation
   rows — the shuffle and cache carry ≤ parts×features×bins rows per task.
2. ``groupBy(part_id, feature, bin).sum`` merges partials; the global
   histogram (the baseline, unless a stored one is supplied) is another
   tiny agg of the same table.
3. PSI = Σ (p−q)·ln(p/q) and KS = max|CDF_p − CDF_q| computed on the
   histogram table — driver-side numpy when parts×features×bins fits the
   driver (the default), Spark window-cumsum otherwise — the fixed-bin KS
   approximation is bounded by bin width (SURVEY.md §7.3).

``decode_features`` / ``histogram_partials`` remain as the two-stage
building blocks (baseline construction over a reference slice, tests).

Bins are FIXED (data-independent) so partials merge exactly and baselines
from different runs are comparable — mirrors the reference's own advice to
drift-score against *stored summaries* (outputs/reports/final_report.md:148).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.audio import (
    clip_features,
    clip_features_ex,
    decode_clip,
    decode_clip_ex,
)
from .base import (
    CheckResult,
    RunContext,
    ensure_part_id,
    part_row_counts,
    verdicts_from_violations,
)

R_DECODE = "R060_decode"
R_DURATION = "R061_duration_consistency"
R_CODEC = "R062_codec_fidelity"
R_CLIPPING = "R063_clipping"
R_SILENCE = "R064_silence"
R_DC = "R065_dc_offset"

# payload-quality thresholds (decoded-PCM rules, computed inside the one
# decode pass — no extra read). Calibrated against the codec family: the
# 0.97 clip level sits above every real codec's full-scale roundtrip
# (µ-law max ≈ 0.984) and far above legit synth peaks (≤ 0.75 + noise);
# the 2e-3 silence level sits above IMA ADPCM's minimum-step wander.
CLIP_LEVEL, CLIP_MAX_RATIO = 0.97, 0.02
SIL_LEVEL, SIL_MIN_RATIO = 2e-3, 0.98
DC_MAX = 0.1

# R066 effective bandwidth: flag clips whose spectral energy at/above
# HF_FRAC × Nyquist is below HF_FLOOR_DB of the total — the signature of
# audio upsampled from a lower rate (8 kHz telephony resold as 16 kHz is
# the classic corpus contaminant) or brutally lowpassed. Calibrated on the
# codec roundtrips: genuine full-band clips sit ≥ −25 dB (broadband noise
# floor), band-limited clips through PCM/FLAC/G.711 sit ≤ −40 dB. IMA
# ADPCM is exempt by default: its own quantization noise floor is ≈ −24 dB
# broadband, which refills the high band and masks the evidence — a
# per-codec floor from the operator is the only honest way to scan ADPCM.
R_BANDWIDTH = "R066_bandwidth"
# R068 container metadata: payloads whose codec has no in-container decoder
# (opus/mp3) are still STRUCTURALLY validated — Ogg page CRCs / MPEG frame
# walk via functions/containers.py — and their container-derived duration,
# sample rate, and channel count are checked against the declared columns.
# A malformed container or a metadata mismatch is a violation; a clean probe
# is surfaced as a per-partition 'container_probed' counter (never silent).
R_CONTAINER = "R068_container_meta"
# R067 speech rate: transcript word count vs MEASURED (VAD) speech seconds
# — the decoded twin of the metadata chars/sec rule (R018). See drift_check.
R_SPEECH_RATE = "R067_speech_rate"
HF_FRAC = 0.55
HF_FLOOR_DB = -32.0
HF_EXEMPT_CODECS = frozenset({"adpcm_ima"})
R_PSI = "R050_drift_psi"
R_KS = "R051_drift_ks"

N_MFCC = 13
FEATURE_NAMES = [f"mfcc_{i}" for i in range(N_MFCC)] + ["rms", "centroid"]


@dataclass(frozen=True)
class BinSpec:
    lo: float
    hi: float
    n: int


# Bin counts sized for per-partition sample sizes in the hundreds: PSI over
# B bins needs n >> B per side or sampling noise dominates (SURVEY.md §7.3
# bounds the KS approximation by bin width; PSI needs the smoothing below).
DEFAULT_BINS: dict[str, BinSpec] = {
    **{f"mfcc_{i}": BinSpec(-60.0, 60.0, 16) for i in range(N_MFCC)},
    "rms": BinSpec(0.0, 1.0, 16),
    "centroid": BinSpec(0.0, 8000.0, 24),
}


# -------------------------------------------- single-pass decode → tiny stats

# Union-typed output of the one-pass decode: histogram partials (kind='h'),
# sparse per-clip violations (kind='v', rule in feature), per-part row
# counters (kind='c'). NOTHING per-clip survives the stage except violations
# — at 10^12 rows a per-clip feature table cannot be persisted, so the
# shuffle/cache carries only histograms + sparse rows.
_STATS_SCHEMA = (
    "kind string, part_id int, feature string, bin int, cnt long, "
    "clip_id string, observed string, expected string"
)


def stats_record_batch(
    clip_ids: list,
    parts,
    payloads,
    codecs: list,
    decl_sr: list,
    decl_dur: list,
    specs: list,
    n_feat: int,
    dur_tol_ms: float = 20.0,
    dur_tol_rel: float = 0.02,
    strict_codecs: bool = False,
    noise: tuple[float, int] | None = None,
    speech: bool = False,
):
    """Decode + featurize + bin ONE Arrow batch into _STATS_SCHEMA rows.

    ``speech=True`` additionally emits one kind='s' row per honestly-decoded
    clip carrying its VAD speech time (feature='speech_ms', cnt=ms) — the
    audio side of the R067 speech-rate check. These are the only per-clip
    rows that leave the payload stage besides violations: as thin as the
    uniqueness check's keys, they key-join the transcript table exactly the
    way the referential check does, so the 10^12-row contract is unchanged.
    The kernel is the O(n) cumsum VAD (operators/segment.py::speech_ms_fast)
    — no extra FFT; fake decodes are skipped (synthetic PCM says nothing
    about real speech).

    ``noise=(level, seed)`` injects deterministic per-clip Gaussian noise
    into the decoded PCM at ``level`` × clip RMS before featurization — the
    robustness harness's perturbation point (the graft of the reference's
    feature-noise injection, src/ids/robustness.py:20-41, onto the audio
    seam). Keyed by xxhash64(clip_id) ^ seed so the perturbation is
    identical at any parallelism/partitioning.

    Fake decodes (codec label without a registered real decoder; see
    functions/audio.py::decode_clip_ex) are never silent: each partition
    emits a kind='c' feature='fake_decodes' counter row, and with
    ``strict_codecs`` the clip instead becomes an R062 violation and is
    excluded from the histograms.

    Shared kernel of the two payload readers: ``decode_stats`` (JVM scan →
    mapInArrow) and ``sources/payload_scan.py`` (Python-native parquet
    row-group reader). ``payloads`` is a pyarrow binary array (zero-copy
    memoryview slicing); ``parts`` is an int ndarray aligned with rows.
    """
    import numpy as np
    import pyarrow as pa

    n = len(clip_ids)
    feats = np.zeros((n, n_feat))
    ok = np.zeros(n, dtype=bool)
    fake = np.zeros(n, dtype=bool)
    probed = np.zeros(n, dtype=bool)  # R068: container-validated, undecodable
    o_kind: list[str] = []
    o_part: list[int] = []
    o_feat: list[str] = []
    o_bin: list[int | None] = []
    o_cnt: list[int | None] = []
    o_clip: list[str | None] = []
    o_obs: list[str | None] = []
    o_exp: list[str | None] = []

    def viol(rule, part, clip, obs, exp):
        o_kind.append("v")
        o_part.append(int(part))
        o_feat.append(rule)
        o_bin.append(None)
        o_cnt.append(None)
        o_clip.append(clip)
        o_obs.append(obs)
        o_exp.append(exp)

    # cross-row batch decode for batch-friendly codecs (adpcm): one
    # vectorized pass for the whole Arrow batch, per-row error semantics
    from semantic_log_detector_spark.functions.audio import predecode_batch

    pre = predecode_batch(payloads, codecs)

    for i in range(n):
        try:
            if i in pre:
                r = pre[i]
                if isinstance(r, Exception):
                    raise r
                pcm, sr, is_fake = r[0], r[1], False
            else:
                v = payloads[i]
                buf = None if not v.is_valid else memoryview(v.as_buffer())
                pcm, sr, is_fake = decode_clip_ex(buf, codecs[i])
            if is_fake:
                fake[i] = True
                if strict_codecs:
                    viol(R_CODEC, parts[i], clip_ids[i],
                         f"codec {codecs[i]!r} fake-decoded (no real decoder)",
                         "registered decoder for declared codec")
                    continue
            if noise is not None and noise[0] > 0:
                from semantic_log_detector_spark.functions.sparkhash import xxhash64

                key = xxhash64(str(clip_ids[i]).encode("utf-8")) ^ (noise[1] & 0xFFFFFFFF)
                rng = np.random.Generator(np.random.Philox(key=key & 0x7FFFFFFFFFFFFFFF))
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2) + 1e-12))
                pcm = pcm + (noise[0] * rms) * rng.standard_normal(
                    len(pcm)
                ).astype(np.float32)
            fv, hf_db = clip_features_ex(pcm, sr, n_mfcc=N_MFCC, hf_frac=HF_FRAC)
            if not np.isfinite(fv).all():
                raise ValueError("non-finite features")
            feats[i] = fv
            ok[i] = True
            if speech and not fake[i]:
                from semantic_log_detector_spark.operators.segment import (
                    speech_ms_fast,
                )

                o_kind.append("s")
                o_part.append(int(parts[i]))
                o_feat.append("speech_ms")
                o_bin.append(None)
                o_cnt.append(int(round(speech_ms_fast(pcm, sr))))
                o_clip.append(clip_ids[i])
                o_obs.append(None)
                o_exp.append(None)
            # R066 effective bandwidth: only on honestly-decoded PCM (fake
            # decodes carry synthetic spectra) and outside the exempt
            # codecs whose quantization floor masks the high band
            if (not fake[i] and codecs[i] not in HF_EXEMPT_CODECS
                    and hf_db < HF_FLOOR_DB):
                viol(R_BANDWIDTH, parts[i], clip_ids[i],
                     f"hf_ratio_db={hf_db:.1f}",
                     f"energy >= {HF_FRAC:.2f}*nyquist above {HF_FLOOR_DB} dB")
            # payload-quality rules on the decoded PCM (same pass, no
            # extra read): clipping, near-silence, DC-offset bias
            absd = np.abs(pcm)
            if len(absd):
                clip_ratio = float((absd >= CLIP_LEVEL).mean())
                if clip_ratio > CLIP_MAX_RATIO:
                    viol(R_CLIPPING, parts[i], clip_ids[i],
                         f"clipping_ratio={clip_ratio:.4f}",
                         f"fraction(|s|>={CLIP_LEVEL}) <= {CLIP_MAX_RATIO}")
                sil_ratio = float((absd < SIL_LEVEL).mean())
                if sil_ratio > SIL_MIN_RATIO:
                    viol(R_SILENCE, parts[i], clip_ids[i],
                         f"silence_ratio={sil_ratio:.4f}",
                         f"fraction(|s|<{SIL_LEVEL}) <= {SIL_MIN_RATIO}")
                dc = float(abs(pcm.mean()))
                if dc > DC_MAX:
                    viol(R_DC, parts[i], clip_ids[i],
                         f"dc_offset={dc:.4f}", f"|mean(s)| <= {DC_MAX}")
            dd, dsr = decl_dur[i], decl_sr[i]
            if dd is not None and dd > 0 and dsr is not None and dsr == sr:
                decoded_ms = len(pcm) * 1000.0 / sr
                if abs(decoded_ms - dd) > max(dur_tol_ms, abs(dd) * dur_tol_rel):
                    viol(R_DURATION, parts[i], clip_ids[i],
                         str(round(decoded_ms, 1)), str(dd))
        except NotImplementedError as e:
            # real container without a registered decoder (opus/mp3 magic):
            # probe the container structure instead of writing the row off —
            # framing integrity + declared-vs-container metadata are still
            # fully checkable (R068), audio decode keeps refusing honestly
            from semantic_log_detector_spark.functions.containers import PROBERS

            v = payloads[i]
            raw = None if not v.is_valid else bytes(memoryview(v.as_buffer()))
            if codecs[i] not in PROBERS or raw is None:
                viol(R_DECODE, parts[i], clip_ids[i],
                     f"{type(e).__name__}: {e}"[:200], "payload decodes cleanly")
                continue
            try:
                meta = PROBERS[codecs[i]](raw)
            except ValueError as pe:
                viol(R_CONTAINER, parts[i], clip_ids[i],
                     f"{type(pe).__name__}: {pe}"[:200],
                     "container structure is valid")
                continue
            probed[i] = True
            dd = decl_dur[i]
            cd = meta.get("duration_ms")
            if dd is not None and dd > 0 and cd is not None:
                tol = max(dur_tol_ms, abs(dd) * dur_tol_rel,
                          meta.get("duration_grain_ms", 0.0))
                if abs(cd - dd) > tol:
                    viol(R_CONTAINER, parts[i], clip_ids[i],
                         f"container_dur_ms={cd:.1f}", str(dd))
            csr = meta.get("sample_rate_hz") or meta.get("input_sample_rate_hz")
            dsr = decl_sr[i]
            if dsr is not None and csr and int(csr) != int(dsr):
                viol(R_CONTAINER, parts[i], clip_ids[i],
                     f"container_sr_hz={csr}", str(dsr))
        except Exception as e:  # decode is allowed to fail per-row
            viol(R_DECODE, parts[i], clip_ids[i],
                 f"{type(e).__name__}: {e}"[:200], "payload decodes cleanly")

    for p in np.unique(parts):
        sel = parts == p
        o_kind.append("c")
        o_part.append(int(p))
        o_feat.append("rows")
        o_bin.append(None)
        o_cnt.append(int(sel.sum()))
        o_clip.append(None)
        o_obs.append(None)
        o_exp.append(None)
        n_fake = int((sel & fake).sum())
        if n_fake:  # surfaced fake-decode counter — never silent
            o_kind.append("c")
            o_part.append(int(p))
            o_feat.append("fake_decodes")
            o_bin.append(None)
            o_cnt.append(n_fake)
            o_clip.append(None)
            o_obs.append(None)
            o_exp.append(None)
        n_probed = int((sel & probed).sum())
        if n_probed:  # container-validated undecodable clips — never silent
            o_kind.append("c")
            o_part.append(int(p))
            o_feat.append("container_probed")
            o_bin.append(None)
            o_cnt.append(n_probed)
            o_clip.append(None)
            o_obs.append(None)
            o_exp.append(None)
        sub = feats[sel & ok]
        if len(sub) == 0:
            continue
        for fi, name, spec in specs:
            idx = np.clip(
                ((sub[:, fi] - spec.lo) / (spec.hi - spec.lo) * spec.n).astype(int),
                0, spec.n - 1,
            )
            binc = np.bincount(idx, minlength=spec.n)
            nz = np.nonzero(binc)[0]
            o_kind.extend(["h"] * len(nz))
            o_part.extend([int(p)] * len(nz))
            o_feat.extend([name] * len(nz))
            o_bin.extend(nz.tolist())
            o_cnt.extend(binc[nz].tolist())
            o_clip.extend([None] * len(nz))
            o_obs.extend([None] * len(nz))
            o_exp.extend([None] * len(nz))

    return pa.record_batch(
        [
            pa.array(o_kind, type=pa.string()),
            pa.array(o_part, type=pa.int32()),
            pa.array(o_feat, type=pa.string()),
            pa.array(o_bin, type=pa.int32()),
            pa.array(o_cnt, type=pa.int64()),
            pa.array(o_clip, type=pa.string()),
            pa.array(o_obs, type=pa.string()),
            pa.array(o_exp, type=pa.string()),
        ],
        names=["kind", "part_id", "feature", "bin", "cnt",
               "clip_id", "observed", "expected"],
    )


def decode_stats(
    df: DataFrame,
    ctx: RunContext,
    bins: dict[str, BinSpec] | None = None,
    dur_tol_ms: float = 20.0,
    dur_tol_rel: float = 0.02,
    strict_codecs: bool = False,
    noise: tuple[float, int] | None = None,
    speech: bool = False,
) -> DataFrame:
    """ONE mapInArrow pass over (clip_id, part_id, bytes, codec, sr_hz,
    dur_ms): decode + feature-extract each clip, bin features into fixed
    per-batch histogram partials, and emit R060/R061 violations inline.

    Output rows (see _STATS_SCHEMA):
      kind='h' → (part_id, feature, bin, cnt) histogram partial
      kind='v' → (part_id, feature=rule_id, clip_id, observed, expected)
      kind='c' → (part_id, feature='rows', cnt) per-batch row counter

    mapInArrow, not mapInPandas: Arrow binary columns slice as zero-copy
    memoryviews (pandas would materialize every payload as Python bytes).
    The downstream groupBy merges 'h'/'c' partials — the shuffle carries
    ≤ parts×features×bins rows per task, never per-clip rows.
    """
    bins = bins or DEFAULT_BINS
    df = ensure_part_id(df, ctx)
    part_col = ctx.part_col
    cols = ["clip_id", part_col, "bytes", "codec", "sr_hz", "dur_ms"]
    specs = [(i, name, bins[name]) for i, name in enumerate(FEATURE_NAMES)]
    n_feat = len(FEATURE_NAMES)

    def gen(batches):
        from semantic_log_detector_spark.checks.drift import stats_record_batch
        from semantic_log_detector_spark.functions.arrowio import prefetch_batches

        # prefetch: overlap the JVM scan/serialize with decode (the socket
        # buffer alone is far too small to pipeline ~100 MB batches)
        for batch in prefetch_batches(batches):
            yield stats_record_batch(
                batch.column("clip_id").to_pylist(),
                np.asarray(batch.column(part_col).to_numpy(zero_copy_only=False)),
                batch.column("bytes"),
                batch.column("codec").to_pylist(),
                batch.column("sr_hz").to_pylist(),
                batch.column("dur_ms").to_pylist(),
                specs, n_feat, dur_tol_ms, dur_tol_rel, strict_codecs, noise,
                speech,
            )

    return df.select(*cols).mapInArrow(gen, schema=_STATS_SCHEMA)


# ------------------------------------------------------------- stage 1: decode


def decode_features(df: DataFrame, ctx: RunContext) -> DataFrame:
    """Per-clip decode + feature extraction. Output: clip_id, part_id, ok,
    err, sr_decoded, n_samples, features array<double> (len 15).

    mapInArrow, not mapInPandas: pandas would materialize every payload as
    a Python bytes object (≈12 GB of allocator churn per 60k-clip pass);
    Arrow binary columns are sliced as zero-copy memoryviews instead, and
    the output is built directly as Arrow arrays.
    """
    df = ensure_part_id(df, ctx)
    cols = ["clip_id", ctx.part_col, "bytes", "codec", "sr_hz", "dur_ms"]
    part_col = ctx.part_col

    def gen(batches):
        import pyarrow as pa

        from semantic_log_detector_spark.functions.arrowio import prefetch_batches

        for batch in prefetch_batches(batches):
            n = batch.num_rows
            payloads = batch.column("bytes")
            codecs = batch.column("codec").to_pylist()
            ok = np.zeros(n, dtype=bool)
            err: list[str | None] = [None] * n
            srd = np.zeros(n, dtype=np.int64)
            nsamp = np.zeros(n, dtype=np.int64)
            feats: list[list[float] | None] = [None] * n
            from semantic_log_detector_spark.functions.audio import (
                predecode_batch,
            )

            pre = predecode_batch(payloads, codecs)
            for i in range(n):
                try:
                    if i in pre:
                        r = pre[i]
                        if isinstance(r, Exception):
                            raise r
                        pcm, sr = r
                    else:
                        v = payloads[i]
                        buf = None if not v.is_valid else memoryview(v.as_buffer())
                        pcm, sr = decode_clip(buf, codecs[i])
                    fv = clip_features(pcm, sr, n_mfcc=N_MFCC)
                    if not np.isfinite(fv).all():
                        raise ValueError("non-finite features")
                    ok[i], srd[i], nsamp[i] = True, sr, len(pcm)
                    feats[i] = fv.tolist()
                except Exception as e:  # decode is allowed to fail per-row
                    err[i] = f"{type(e).__name__}: {e}"[:200]
            yield pa.record_batch(
                [
                    batch.column("clip_id"),
                    batch.column(part_col),
                    batch.column("sr_hz"),
                    batch.column("dur_ms"),
                    pa.array(ok),
                    pa.array(err, type=pa.string()),
                    pa.array(srd),
                    pa.array(nsamp),
                    pa.array(feats, type=pa.list_(pa.float64())),
                ],
                names=["clip_id", part_col, "declared_sr", "declared_dur",
                       "ok", "err", "sr_decoded", "n_samples", "features"],
            )

    schema = (
        f"clip_id string, {part_col} int, declared_sr int, declared_dur int, "
        "ok boolean, err string, sr_decoded long, n_samples long, features array<double>"
    )
    return df.select(*cols).mapInArrow(gen, schema=schema)


def decode_violations(feats: DataFrame, ctx: RunContext, dur_tol_ms: float = 20.0,
                      dur_tol_rel: float = 0.02) -> DataFrame:
    """R060 decode errors + R061 declared-vs-decoded duration mismatch."""
    # try_divide: sr_decoded is 0 on failed decodes and ANSI mode would raise
    decoded_ms = F.try_divide(F.col("n_samples") * 1000.0, F.col("sr_decoded"))
    tol = F.greatest(F.lit(dur_tol_ms), F.abs(F.col("declared_dur")) * dur_tol_rel)
    bad_dur = (
        F.col("ok")
        & F.col("declared_dur").isNotNull()
        & (F.col("declared_dur") > 0)
        & F.col("declared_sr").isNotNull()
        & (F.col("declared_sr") == F.col("sr_decoded"))
        & (F.abs(decoded_ms - F.col("declared_dur")) > tol)
    )
    v_decode = feats.filter(~F.col("ok")).select(
        F.lit(ctx.run_id).alias("run_id"),
        F.col(ctx.part_col).cast("int").alias("part_id"),
        F.lit(R_DECODE).alias("rule_id"),
        "clip_id",
        F.lit("bytes").alias("column"),
        F.col("err").alias("observed"),
        F.lit("payload decodes cleanly").alias("expected"),
        F.lit("Critical").alias("severity"),
        F.concat(F.lit("payload failed to decode: "), F.col("err")).alias("explanation"),
    )
    v_dur = feats.filter(bad_dur).select(
        F.lit(ctx.run_id).alias("run_id"),
        F.col(ctx.part_col).cast("int").alias("part_id"),
        F.lit(R_DURATION).alias("rule_id"),
        "clip_id",
        F.lit("dur_ms").alias("column"),
        F.round(decoded_ms, 1).cast("string").alias("observed"),
        F.col("declared_dur").cast("string").alias("expected"),
        F.lit("Medium").alias("severity"),
        F.lit("decoded duration differs from declared dur_ms").alias("explanation"),
    )
    return v_decode.unionByName(v_dur)


# -------------------------------------------------- stage 2: histogram partials


def histogram_partials(feats: DataFrame, ctx: RunContext,
                       bins: dict[str, BinSpec] | None = None) -> DataFrame:
    """Per-Arrow-batch fixed-bin histogram partials — hand-rolled map-side
    combine so the shuffle carries histograms, not clips."""
    bins = bins or DEFAULT_BINS
    part_col = ctx.part_col
    specs = [(i, name, bins[name]) for i, name in enumerate(FEATURE_NAMES)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["ok"]]
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["features"].to_numpy())  # n × n_features
            parts = pdf[part_col].to_numpy()
            out_part, out_feat, out_bin, out_cnt = [], [], [], []
            for p in np.unique(parts):
                sub = mat[parts == p]
                for fi, name, spec in specs:
                    v = sub[:, fi]
                    idx = np.clip(
                        ((v - spec.lo) / (spec.hi - spec.lo) * spec.n).astype(int),
                        0, spec.n - 1,
                    )
                    binc = np.bincount(idx, minlength=spec.n)
                    nz = np.nonzero(binc)[0]
                    out_part.extend([int(p)] * len(nz))
                    out_feat.extend([name] * len(nz))
                    out_bin.extend(nz.tolist())
                    out_cnt.extend(binc[nz].tolist())
            yield pd.DataFrame(
                {part_col: out_part, "feature": out_feat, "bin": out_bin, "cnt": out_cnt}
            )

    partials = feats.mapInPandas(
        gen, schema=f"{part_col} int, feature string, bin int, cnt long"
    )
    return partials.groupBy(part_col, "feature", "bin").agg(F.sum("cnt").alias("cnt"))


# ------------------------------------------------------------ stage 3: scoring

# Laplace (add-α) smoothing for PSI: p=(cnt+α)/(n+αB). Symmetric in p and q,
# unlike a bare epsilon, so empty sample bins don't blow up ln(p/q).
_ALPHA = 0.5


def drift_scores_local(hist_rows: list, ctx: RunContext) -> list[tuple]:
    """Driver-side PSI/KS on collected histogram rows [(part, feature, bin,
    cnt)] — numpy, vectorized per (part, feature). SURVEY.md §4.4: PSI/KS
    belong on the *collected tiny histogram tables* once they fit the
    driver (parts × features × bins; ≈23k rows at P=64, ≈1.5M at P=4096).
    Returns [(part_id, feature, psi, ks)]. Exact same math as the
    Spark-side `drift_scores` (Laplace-smoothed PSI, fixed-bin KS).
    """
    import collections

    by_feat: dict[str, dict] = collections.defaultdict(dict)
    bins_by_feat: dict[str, set] = collections.defaultdict(set)
    parts = set()
    for part, feature, b, cnt in hist_rows:
        by_feat[feature][(part, b)] = cnt
        bins_by_feat[feature].add(b)
        parts.add(part)
    out = []
    for feature, cells in by_feat.items():
        bins = sorted(bins_by_feat[feature])
        bidx = {b: i for i, b in enumerate(bins)}
        plist = sorted(parts)
        pidx = {p: i for i, p in enumerate(plist)}
        mat = np.zeros((len(plist), len(bins)))
        for (part, b), cnt in cells.items():
            mat[pidx[part], bidx[b]] = cnt
        base = mat.sum(axis=0)
        nb = len(bins)
        p = (mat + _ALPHA) / (mat.sum(axis=1, keepdims=True) + _ALPHA * nb)
        q = (base + _ALPHA) / (base.sum() + _ALPHA * nb)
        psi = ((p - q) * np.log(p / q)).sum(axis=1)
        cdf_p = np.cumsum(mat, axis=1) / np.maximum(mat.sum(axis=1, keepdims=True), 1)
        cdf_q = np.cumsum(base) / max(base.sum(), 1)
        ks = np.abs(cdf_p - cdf_q).max(axis=1)
        for i, part in enumerate(plist):
            out.append((int(part), feature, float(psi[i]), float(ks[i])))
    return out


def drift_scores(hist: DataFrame, ctx: RunContext,
                 baseline: DataFrame | None = None) -> DataFrame:
    """Per (part_id, feature): PSI + fixed-bin KS vs baseline.

    `baseline` defaults to the global histogram (sum over partitions) — a
    self-baseline in the spirit of the reference's fit-on-normal pass
    (`src/detection/pipeline.py:124-134`); pass a stored baseline table
    (feature, bin, cnt) for cross-run drift. For the default self-baseline
    at modest partition counts, `drift_check` uses `drift_scores_local`
    (one collect of the tiny histogram) instead of this three-shuffle plan.
    """
    part_col = ctx.part_col
    if baseline is None:
        baseline = hist.groupBy("feature", "bin").agg(F.sum("cnt").alias("bcnt"))
    else:
        baseline = baseline.select("feature", "bin", F.col("cnt").alias("bcnt"))

    # align bins: grid = (parts present) × (baseline bins), fill missing with 0
    parts = hist.select(part_col).distinct()
    grid = parts.crossJoin(F.broadcast(baseline))
    j = grid.join(hist, [part_col, "feature", "bin"], "left").fillna({"cnt": 0})

    tot = Window.partitionBy(part_col, "feature")
    cum = Window.partitionBy(part_col, "feature").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    n_bins = F.count("*").over(tot)
    p = (F.col("cnt") + _ALPHA) / (F.sum("cnt").over(tot) + _ALPHA * n_bins)
    q = (F.col("bcnt") + _ALPHA) / (F.sum("bcnt").over(tot) + _ALPHA * n_bins)
    scored = j.select(
        part_col,
        "feature",
        "bin",
        ((p - q) * F.log(p / q)).alias("psi_term"),
        (F.sum(F.col("cnt")).over(cum) / F.sum("cnt").over(tot)).alias("cdf_p"),
        (F.sum(F.col("bcnt")).over(cum) / F.sum("bcnt").over(tot)).alias("cdf_q"),
    )
    return scored.groupBy(part_col, "feature").agg(
        F.sum("psi_term").alias("psi"),
        F.max(F.abs(F.col("cdf_p") - F.col("cdf_q"))).alias("ks"),
    )


def calibrate_threshold(scored: DataFrame, score_col: str, label_col: str,
                        objective: str = "f1") -> tuple[float, float]:
    """Threshold calibration over labeled fixtures (SURVEY.md A10;
    `src/ids/threshold_calibrator.py:50-124`): sweep every observed score as
    a candidate threshold via a window cumulative sum (one pass, no
    driver-side loop) and return (best_threshold, best_objective).

    objective: 'f1' (max-F1) or 'youden' (max TPR−FPR).
    """
    from pyspark.sql import Window

    by_v = (
        scored.select(F.col(score_col).alias("v"), F.col(label_col).cast("long").alias("y"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("npos"))
    )
    tot = scored.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.col(label_col).cast("long")).alias("pos_all"),
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(Window.unboundedPreceding, 0)
    s = (
        by_v.withColumn("tp", F.sum("npos").over(w))
        .withColumn("pp", F.sum("n").over(w))
        .crossJoin(F.broadcast(tot))
    )
    tp = F.col("tp")
    fp = F.col("pp") - tp
    fn = F.col("pos_all") - tp
    tn = F.col("n_all") - F.col("pp") - fn
    if objective == "f1":
        obj = 2 * tp / (2 * tp + fp + fn)
    elif objective == "youden":
        obj = tp / (tp + fn) - fp / (fp + tn)
    else:
        raise ValueError(objective)
    best = (
        s.select(F.col("v").alias("threshold"), obj.alias("objective"))
        .orderBy(F.desc("objective"), F.asc("threshold"))
        .first()
    )
    return float(best["threshold"]), float(best["objective"])


def drift_check(
    clips: DataFrame,
    ctx: RunContext,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.2,
    baseline: DataFrame | None = None,
    bins: dict[str, BinSpec] | None = None,
    payload_path: str | None = None,
    pending_parts: list[int] | None = None,
    strict_codecs: bool = False,
    noise: tuple[float, int] | None = None,
    transcripts: DataFrame | None = None,
    wps_range: tuple[float, float] = (0.4, 8.0),
    min_words_fast: int = 3,
    min_speech_slow_s: float = 2.0,
) -> CheckResult:
    """Full drift + decode check. Returns verdicts per (part, rule) for
    R050/R051 (drift) and violations for R060/R061 (decode/duration).

    ``transcripts`` (clip_id, transcript) switches on R067_speech_rate: the
    decoded-PCM twin of the metadata chars/sec row rule (R018). The decode
    pass emits each clip's VAD speech time (kind='s' rows, zero extra FFT)
    and the transcript's whitespace word count — computed JVM-side — must
    be plausible against it: a transcript with ≥ ``min_words_fast`` words
    needs speech time ≥ words/max_wps (catches transcripts paired with
    silence or the wrong clip — metadata rules can't see decoded silence),
    and ≥ ``min_speech_slow_s`` s of measured speech needs ≥
    min_wps × speech_s words (catches truncated/empty transcripts under
    speechy audio). Inner join on clip_id: clips with no transcript row are
    the referential check's finding, not double-reported here. Bounds are
    generous (default 0.4–8 wps vs ~2–3 for natural speech) because energy
    VAD counts any energy as speech (music corpora should widen or disable
    via SuiteConfig). Both sides of the join are thin per-clip rows — the
    same scale shape as the referential check.

    One heavy pass: ``decode_stats`` reads bytes exactly once and emits only
    tiny rows (histogram partials, sparse violations, row counters), so the
    persist below caches kilobytes regardless of input size — the per-clip
    feature table never exists (it couldn't, at 10^12 rows).

    When ``payload_path`` names the parquet table backing ``clips`` (pure
    scan, no transformations), the heavy pass runs as the Python-native
    row-group reader (sources/payload_scan.py): payload bytes never cross
    the JVM→worker socket. ``pending_parts`` scopes it for wave resume."""
    speech = transcripts is not None
    if payload_path is not None:
        from ..sources.payload_scan import payload_stats_scan

        stats = payload_stats_scan(
            clips.sparkSession, payload_path, ctx, bins, pending_parts,
            strict_codecs=strict_codecs, noise=noise, speech=speech)
    else:
        stats = decode_stats(clips, ctx, bins, strict_codecs=strict_codecs,
                             noise=noise, speech=speech)
    stats.persist()
    try:
        hist = (
            stats.filter(F.col("kind") == "h")
            .groupBy(F.col("part_id").alias(ctx.part_col), "feature", "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        part_counts = (
            stats.filter((F.col("kind") == "c") & (F.col("feature") == "rows"))
            .groupBy(F.col("part_id").alias(ctx.part_col))
            .agg(F.sum("cnt").alias("n_rows"))
        )
        fake_counts = (
            stats.filter((F.col("kind") == "c") & (F.col("feature") == "fake_decodes"))
            .groupBy(F.col("part_id").alias(ctx.part_col))
            .agg(F.sum("cnt").alias("n_fake"))
        )
        is_decode = F.col("feature") == R_DECODE
        is_codec = F.col("feature") == R_CODEC
        is_container = F.col("feature") == R_CONTAINER
        is_quality = F.col("feature").isin(R_CLIPPING, R_SILENCE, R_DC, R_BANDWIDTH)
        viol_rows = stats.filter(F.col("kind") == "v").select(
            F.lit(ctx.run_id).alias("run_id"),
            F.col("part_id").cast("int").alias("part_id"),
            F.col("feature").alias("rule_id"),
            "clip_id",
            F.when(is_codec, F.lit("codec"))
            .when(is_decode | is_quality | is_container, F.lit("bytes"))
            .otherwise(F.lit("dur_ms")).alias("column"),
            F.col("observed"),
            F.col("expected"),
            F.when(is_decode, F.lit("Critical"))
            .when(is_codec | is_container, F.lit("High"))
            .otherwise(F.lit("Medium")).alias("severity"),
            F.when(
                is_decode,
                F.concat(F.lit("payload failed to decode: "), F.col("observed")),
            ).when(
                is_container,
                F.lit("undecodable payload failed container-level validation "
                      "(framing integrity or declared-metadata mismatch)"),
            ).when(
                is_codec,
                F.lit("declared codec has no registered decoder (strict_codecs)"),
            ).when(
                F.col("feature") == R_CLIPPING,
                F.lit("decoded waveform is clipped (flat-topped at full scale)"),
            ).when(
                F.col("feature") == R_SILENCE,
                F.lit("decoded waveform is effectively silent"),
            ).when(
                F.col("feature") == R_DC,
                F.lit("decoded waveform carries a DC-offset bias"),
            ).when(
                F.col("feature") == R_BANDWIDTH,
                F.lit("effective bandwidth far below Nyquist (upsampled or lowpassed audio)"),
            ).otherwise(F.lit("decoded duration differs from declared dur_ms")).alias("explanation"),
        )

        if baseline is None and ctx.num_parts <= 8192:
            # tiny-histogram fast path (SURVEY.md §4.4): one collect of
            # parts × features × bins rows, PSI/KS in numpy — replaces a
            # three-shuffle window plan with one job
            rows = [tuple(r) for r in hist.collect()]
            scored = drift_scores_local(rows, ctx)
            best: dict[int, tuple[float, float, str]] = {}
            for part, feature, psi, ks in scored:
                cur = best.get(part)
                max_psi = max(psi, cur[0]) if cur else psi
                max_ks = max(ks, cur[1]) if cur else ks
                worst = feature if (cur is None or psi >= cur[0]) else cur[2]
                best[part] = (max_psi, max_ks, worst)
            spark = clips.sparkSession
            per_part = spark.createDataFrame(
                [(p, v[0], v[1], v[2]) for p, v in best.items()],
                f"{ctx.part_col} int, max_psi double, max_ks double, worst_feature string",
            )
        else:
            scores = drift_scores(hist, ctx, baseline)
            per_part = scores.groupBy(ctx.part_col).agg(
                F.max("psi").alias("max_psi"),
                F.max("ks").alias("max_ks"),
                F.max_by("feature", "psi").alias("worst_feature"),
            )
        base = part_counts.join(per_part, ctx.part_col, "left")
        verdicts = None
        for rule, col, thr in ((R_PSI, "max_psi", psi_threshold), (R_KS, "max_ks", ks_threshold)):
            v = base.select(
                F.lit(ctx.run_id).alias("run_id"),
                F.col(ctx.part_col).cast("int").alias("part_id"),
                F.lit(rule).alias("rule_id"),
                F.coalesce(F.col(col) <= thr, F.lit(True)).alias("passed"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.when(F.coalesce(F.col(col) <= thr, F.lit(True)), 0).otherwise(1).cast("long").alias("n_violations"),
                F.concat(F.lit(f"{col}="), F.round(F.col(col), 4), F.lit(" feature="), F.col("worst_feature")).alias("observed"),
                F.lit(f"{col} <= {thr}").alias("expected"),
            )
            verdicts = v if verdicts is None else verdicts.unionByName(v)

        drift_viols = base.filter(
            (F.col("max_psi") > psi_threshold) | (F.col("max_ks") > ks_threshold)
        ).select(
            F.lit(ctx.run_id).alias("run_id"),
            F.col(ctx.part_col).cast("int").alias("part_id"),
            F.when(F.col("max_psi") > psi_threshold, F.lit(R_PSI)).otherwise(F.lit(R_KS)).alias("rule_id"),
            F.lit(None).cast("string").alias("clip_id"),
            F.col("worst_feature").alias("column"),
            F.concat(F.lit("psi="), F.round("max_psi", 4), F.lit(" ks="), F.round("max_ks", 4)).alias("observed"),
            F.lit(f"psi<={psi_threshold} ks<={ks_threshold}").alias("expected"),
            F.lit("High").alias("severity"),
            F.concat(
                F.lit("partition feature distribution drifted from baseline ("),
                F.col("worst_feature"), F.lit(")"),
            ).alias("explanation"),
        )
        if speech:
            min_wps, max_wps = wps_range
            t = F.trim(F.col("transcript"))
            words = F.when(
                F.col("transcript").isNull() | (t == ""), F.lit(0)
            ).otherwise(F.size(F.split(t, r"\s+")))
            wc = transcripts.select(F.col("clip_id"), words.alias("words"))
            sp = stats.filter(F.col("kind") == "s").select(
                "part_id", "clip_id",
                (F.col("cnt") / 1000.0).alias("speech_s"))
            # multiplication forms, not words/speech_s: ANSI mode + no
            # div-by-zero branch needed for silent clips (speech_s = 0)
            too_fast = (F.col("words") >= min_words_fast) & (
                F.col("words") > F.col("speech_s") * max_wps)
            too_slow = (F.col("speech_s") >= min_speech_slow_s) & (
                F.col("words") < F.col("speech_s") * min_wps)
            sr_viols = sp.join(wc, "clip_id").filter(too_fast | too_slow).select(
                F.lit(ctx.run_id).alias("run_id"),
                F.col("part_id").cast("int").alias("part_id"),
                F.lit(R_SPEECH_RATE).alias("rule_id"),
                "clip_id",
                F.lit("transcript").alias("column"),
                F.concat(F.lit("words="), F.col("words"),
                         F.lit(" speech_s="), F.round("speech_s", 2)).alias("observed"),
                F.lit(f"{min_wps} <= words/speech_s <= {max_wps}").alias("expected"),
                F.lit("Medium").alias("severity"),
                F.when(too_fast, F.lit(
                    "transcript too wordy for the measured speech time "
                    "(wrong pairing or hallucinated text)"
                )).otherwise(F.lit(
                    "speechy audio with an implausibly short transcript "
                    "(truncated or mismatched text)"
                )).alias("explanation"),
            )
            viol_rows = viol_rows.unionByName(sr_viols)
        decode_rules = [R_DECODE, R_DURATION, R_CLIPPING, R_SILENCE, R_DC,
                        R_BANDWIDTH, R_CONTAINER] \
            + ([R_CODEC] if strict_codecs else []) \
            + ([R_SPEECH_RATE] if speech else [])
        decode_verdicts = verdicts_from_violations(
            viol_rows.withColumnRenamed("part_id", ctx.part_col),
            part_counts,
            ctx,
            decode_rules,
        )
        verdicts = verdicts.unionByName(decode_verdicts)
        if not strict_codecs:
            # lenient mode: fake decodes pass but are REPORTED per partition
            # in the R062 verdict row — the no-silent-fake contract
            codec_verdicts = part_counts.join(fake_counts, ctx.part_col, "left").select(
                F.lit(ctx.run_id).alias("run_id"),
                F.col(ctx.part_col).cast("int").alias("part_id"),
                F.lit(R_CODEC).alias("rule_id"),
                F.lit(True).alias("passed"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.lit(0).cast("long").alias("n_violations"),
                F.concat(
                    F.lit("n_fake_decoded="), F.coalesce(F.col("n_fake"), F.lit(0))
                ).alias("observed"),
                F.lit("real decoder registered for every declared codec").alias("expected"),
            )
            verdicts = verdicts.unionByName(codec_verdicts)
        violations = viol_rows.unionByName(drift_viols)
        # verdict/violation plans stay LAZY over the cached stats pass — the
        # caller's batched write/collect actions materialize them (and must
        # call .release() after). Eager localCheckpoints here would cost two
        # extra jobs per run, pure fixed cost against scaling efficiency.
        return CheckResult("drift", verdicts, violations, resources=[stats])
    except Exception:
        stats.unpersist()
        raise

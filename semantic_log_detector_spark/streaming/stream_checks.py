"""Structured Streaming mode for the validation checks.

The reference's "streaming" is an asyncio queue drained by a background
task (`src/api/main.py:64-75,142-149`) and in-process deques for windows
(`src/detection/time_aware.py:38-52`, `src/rules/engine.py:54-77` — which
silently uses *arrival* time). Here the same semantics run on Structured
Streaming with explicit event-time + watermarks:

- ``stream_row_violations``: the single-scan row-rule projection applied to
  a streaming DataFrame — stateless, so it runs unchanged on a stream.
- ``stream_windowed_counts``: W5 (failed-login burst) as a tumbling
  event-time window with a watermark for late data.
- ``stream_suite``: foreachBatch micro-batch driver that reuses the batch
  check suite per micro-batch and appends verdicts/violations/ledger —
  the streaming twin of the wave runner (plans/runner.py), sharing all
  check code.

The batch wave runner remains the primary 10^12-row path per north_rule
(batch-at-scale with a resumable ledger); this module is the online mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.base import RunContext, ensure_part_id
from ..checks.row_rules import RowRule, violation_projection


def stream_row_violations(stream_df: DataFrame, rules: list[RowRule],
                          ctx: RunContext) -> DataFrame:
    """Stateless row rules on a stream: the exact batch projection
    (checks/row_rules.violation_projection), reused verbatim — Catalyst
    doesn't care that the source is unbounded."""
    rules = [r for r in rules if r.column in stream_df.columns]
    df = ensure_part_id(stream_df, ctx)
    return violation_projection(df, rules, ctx)


def stream_windowed_counts(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "60 seconds",
    watermark: str = "2 minutes",
    min_count: int = 5,
    predicate=None,
) -> DataFrame:
    """W5 with real event-time semantics: tumbling window + watermark
    (the reference used datetime.now() — arrival time — and could not
    handle late data; SURVEY.md §2.5 note)."""
    d = stream_df.withWatermark(ts_col, watermark)
    if predicate is not None:
        d = d.filter(predicate)
    return (
        d.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def stream_duplicate_ids(
    stream_df: DataFrame,
    id_col: str,
    ts_col: str,
    window: str = "60 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Online clip_id uniqueness: duplicate ids surfaced as they arrive.

    The batch uniqueness check (checks/uniqueness.py) is the complete
    authority — one hash-partitioned groupBy over the full table. Its
    streaming twin must bound state, so duplicates are detected within an
    event-time window + watermark: groupBy(window, id) keeps state only
    until the watermark passes, and a duplicate pair whose occurrences
    straddle windows is deferred to the batch check (documented bounded-
    state trade-off — NOT a silent miss: the suite always runs the batch
    check over the at-rest table).

    Returns violation-shaped rows (window_start, window_end, <id_col>,
    n_dups) in append mode once the watermark closes a window."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            id_col,
            "n_dups",
        )
    )


def stream_audio_dups(
    stream_df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    window: str = "60 seconds",
    watermark: str = "10 minutes",
    max_ids: int = 20,
) -> DataFrame:
    """Online acoustic content-dup detection: the batch melody-fingerprint
    kernel (`operators/audio_dedup.audio_fingerprint` — stateless
    mapInPandas, so Structured Streaming runs it unchanged per
    micro-batch) keyed into the same bounded-state window/watermark shape
    as `stream_duplicate_ids`.

    Two documented narrowings vs the batch authority (`audio_dup_pairs`):
    matches are EXACT fingerprint equality (Hamming 0 — which is what the
    codec-invariant fingerprint measures for true re-encodes; the
    Hamming-≤3 banded search stays batch-side where state is free), and
    pairs straddling windows past the watermark defer to the batch pass —
    bounded state, never a silent contract.

    Emits, in append mode once the watermark closes a window:
    (window_start, window_end, fp, n_clips, clip_ids[≤max_ids])."""
    from ..operators.audio_dedup import audio_fingerprint

    fps = audio_fingerprint(
        stream_df, id_col, bytes_col, codec_col, passthrough=(ts_col,)
    ).filter((~F.col("fake")) & F.col("fp").isNotNull())
    return (
        fps.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "fp")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.slice(F.sort_array(F.collect_set("id")), 1, max_ids).alias("clip_ids"),
        )
        .filter(F.col("n_clips") > 1)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "fp",
            "n_clips",
            "clip_ids",
        )
    )


def stream_suite(
    stream_df: DataFrame,
    out_dir: str,
    ctx: RunContext,
    rules: list[RowRule],
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """foreachBatch micro-batch driver: per micro-batch, run the stateless
    checks and append outputs — exactly-once via the streaming checkpoint
    (the stream-side analog of the wave ledger)."""

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        viol = stream_row_violations(batch_df, rules, ctx)
        viol.write.mode("append").parquet(f"{out_dir}/violations")

    writer = (
        stream_df.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_payload_violations(stream_df: DataFrame, ctx: RunContext) -> DataFrame:
    """Per-clip payload violations (R060 decode, R061 duration, R063
    clipping, R064 silence, R065 DC offset, R066 bandwidth) on a STREAM
    of clips.

    Stateless: ``checks.drift.decode_stats`` is a mapInArrow kernel, which
    Structured Streaming runs unchanged per micro-batch — the exact batch
    rule code (same thresholds, same one-pass decode) emitting the sparse
    violation rows only. Pair with ``stateful.stream_feature_drift`` for
    the distribution-level signal; this is the per-clip level.
    """
    from ..checks.drift import decode_stats

    return (
        decode_stats(stream_df, ctx)
        .filter(F.col("kind") == "v")
        .select(
            F.col("part_id"),
            F.col("feature").alias("rule_id"),
            "clip_id",
            "observed",
            "expected",
        )
    )


def stream_speech_health(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "60 seconds",
    watermark: str = "2 minutes",
    min_speech_ratio: float = 0.3,
) -> DataFrame:
    """Windowed speech-health monitor on a clip stream: is a feed going
    silent, undecodable, or fake-routed? The per-clip kernel is
    `audio_curate.audio_profile` — the SAME one-decode pass the batch
    curation capstone runs, unchanged per micro-batch (stateless
    mapInPandas; Structured Streaming only adds the window/watermark agg
    on the thin profile rows, never on payloads). Append-mode compatible.

    Emits per (window): n_clips, n_undecodable, n_fake, n_low_speech,
    n_speech_ok, mean_speech_ratio (over honestly-decoded clips), and
    speech_s_total — the numbers an ingest operator alerts on. The batch
    authority for anything deeper (dedup, curation keep/drop) remains
    `curate_audio_corpus`; this twin deliberately carries NO cross-window
    state (same deferral contract as stream_audio_dups)."""
    from ..operators.audio_curate import audio_profile

    prof = audio_profile(stream_df, passthrough=(ts_col,))
    real = F.col("decode_ok") & ~F.col("fake")
    low = real & (F.col("speech_ratio") < min_speech_ratio)
    return (
        prof.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum((~F.col("decode_ok")).cast("long")).alias("n_undecodable"),
            F.sum(F.col("fake").cast("long")).alias("n_fake"),
            F.sum(low.cast("long")).alias("n_low_speech"),
            F.sum((real & ~low).cast("long")).alias("n_speech_ok"),
            F.round(
                F.avg(F.when(real, F.col("speech_ratio"))), 4
            ).alias("mean_speech_ratio"),
            F.round(
                F.sum(F.when(real, F.col("speech_s")).otherwise(F.lit(0.0))), 3
            ).alias("speech_s_total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_clips", "n_undecodable", "n_fake", "n_low_speech",
            "n_speech_ok", "mean_speech_ratio", "speech_s_total",
        )
    )

"""Duration-bucketed training-batch assembly — the padding-waste minimizer.

Audio models train on fixed batches padded to the longest clip in the
batch; batching clips of wildly different durations burns compute on
padding (a 1 s clip in a batch with a 30 s clip is 97% pad). The standard
fix — used by every major ASR recipe — is duration bucketing: group clips
of similar length, form batches within a bucket. This operator is the
deterministic, distributed version: the audio-side complement of
`packing.pack_sequences` (which concatenates variable-length docs into
fixed windows; here items stay whole and the objective is minimal pad).
(Extends the reference's fixed `batch_size=32` inference batching,
src/ids/pipeline.py:84-94, into a length-aware assignment.)

Semantics (pure function of the id/duration set — partitioning-invariant):
  bucket  = #boundaries ≤ dur          (explicit boundary list)
  shard   = md5_60(id) % num_shards    (same device as splits.hash_split)
  seq     = row_number within (bucket, shard) ordered by (dur, id)
  batch   = (bucket, shard, (seq-1) // batch_size)

Scale: ONE hash shuffle on (bucket, shard); each window partition holds
~corpus/(buckets × num_shards) rows, so ``num_shards`` is the straggler
knob — a trillion-clip bucket never funnels through one task. Sharding
costs batch quality nothing in expectation (md5 is uniform, so each
shard sees the same duration distribution), and determinism survives any
parallelism because nothing depends on physical layout. Remainder batches
(< batch_size clips at each (bucket, shard) tail) are kept and flagged,
never silently dropped — dropping them is the trainer's policy decision,
and `batch_padding_stats` gives the numbers to make it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BOUNDARIES = (1000, 2000, 4000, 8000, 16000)


def _md5_shard(id_col: str, num_shards: int):
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("long") % num_shards
    )


def duration_batches(
    df: DataFrame,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
    batch_size: int = 16,
    boundaries: tuple[float, ...] = DEFAULT_BOUNDARIES,
    num_shards: int = 32,
) -> DataFrame:
    """Assign every clip to a duration-homogeneous training batch.

    Returns one row per input clip with a valid duration: (id_col,
    dur_col, bucket, shard, batch_index, batch_id, batch_n, batch_max_dur,
    is_complete). Rows with null/negative duration are excluded from
    batching (they cannot be padded against) — count them upstream; this
    operator's accounting covers every row it was given a duration for.

    ``boundaries`` must be sorted ascending; bucket b holds durations in
    [boundaries[b-1], boundaries[b]) with open ends below/above.
    """
    if sorted(boundaries) != list(boundaries):
        raise ValueError(f"boundaries must be ascending, got {boundaries}")
    if batch_size <= 0 or num_shards <= 0:
        raise ValueError("batch_size and num_shards must be positive")
    dur = F.col(dur_col)
    barr = F.array(*[F.lit(float(b)) for b in boundaries])
    bucket = F.size(F.filter(barr, lambda b: b <= dur.cast("double")))
    base = (
        df.select(id_col, dur_col)
        .filter(dur.isNotNull() & (dur >= 0))
        .withColumn("bucket", bucket)
        .withColumn("shard", _md5_shard(id_col, num_shards).cast("int"))
    )
    w = Window.partitionBy("bucket", "shard").orderBy(dur_col, id_col)
    assigned = base.withColumn(
        "batch_index",
        ((F.row_number().over(w) - 1) / batch_size).cast("int"),
    ).withColumn(
        "batch_id",
        F.concat_ws("-", F.col("bucket"), F.col("shard"), F.col("batch_index")),
    )
    # per-batch stats partitioned by (bucket, shard, batch_index), NOT the
    # concatenated batch_id: hash(bucket, shard) from the assignment window
    # already co-locates every finer (…, batch_index) group, so Spark
    # satisfies this window with a sort only — no second shuffle (machine-
    # checked by test_single_shuffle_plan)
    wb = Window.partitionBy("bucket", "shard", "batch_index")
    return assigned.withColumn(
        "batch_n", F.count(F.lit(1)).over(wb).cast("int")
    ).withColumn(
        "batch_max_dur", F.max(dur_col).over(wb)
    ).withColumn(
        "is_complete", F.col("batch_n") == F.lit(batch_size)
    )


def batch_padding_stats(assigned: DataFrame, dur_col: str = "dur_ms") -> DataFrame:
    """One-row padding-waste accounting over a `duration_batches` result:
    (n_batches, n_clips, n_incomplete, padded_ms, content_ms, pad_waste) —
    ``pad_waste`` is the fraction of padded compute that is padding,
    1 − content/padded. Batch-granular aggregation: never wider than the
    batch count."""
    per_batch = assigned.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(dur_col).alias("max_dur"),
        F.sum(dur_col).alias("sum_dur"),
    )
    return per_batch.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("n").cast("long").alias("n_clips"),
        F.sum((F.col("n") * F.col("max_dur")).cast("long")).alias("padded_ms"),
        F.sum("sum_dur").cast("long").alias("content_ms"),
    ).select(
        "n_batches", "n_clips", "padded_ms", "content_ms",
        F.round(F.lit(1.0) - F.col("content_ms") / F.col("padded_ms"), 6)
        .alias("pad_waste"),
    )

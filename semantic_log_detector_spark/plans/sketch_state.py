"""Cross-increment corpus statistics from mergeable sketches.

At 10^12 clips, "how many distinct clip_ids does the corpus hold?" and
"what is the corpus-wide p95 duration?" cannot be answered by rescanning —
a full pass is the thing incremental validation exists to avoid. This
module persists ONE tiny row of mergeable sketches per increment
(DataSketches HLL for distincts, KLL for quantiles — both built into
Spark's agg functions, JVM-side, order-invariant under merge) so any
later question about the WHOLE corpus folds over kilobytes instead of
terabytes:

- ``corpus_rollup``: distinct clip_ids / distinct transcripts / total
  rows / duration+rate quantiles for everything ever ingested, from
  ``hll_union_agg`` + pairwise ``kll_sketch_merge`` over the stored rows.
- ``feed_overlap``: for each increment, the estimated id overlap against
  the union of all PRIOR increments via inclusion-exclusion
  (|A∩B| ≈ |A|+|B|−|A∪B| on HLL unions). A feed delivered twice — the
  classic append-only-lake failure (retried upload, replayed queue
  segment) — shows up as overlap_ratio ≈ 1 on an increment that passed
  every per-file check, because re-sent data is valid data. Flagged rows
  carry rule id R090.

Error bounds: HLL at lgK=14 has ~0.8% relative standard error (16 KiB per
sketch); KLL at k=200 has ~1.3% rank error. Both are documented by the
DataSketches library Spark embeds. The overlap estimator subtracts three
HLL estimates, so its absolute error is ~1.4% of the LARGER set — ratios
beyond ~0.05 on a same-sized increment are signal, and the R090 default
threshold (0.5) is 10x above the noise floor.

Scale shape: the sketch build is one payload-free agg over the increment
(never touches ``bytes``; partial aggregation map-side, one 1-row result).
Rollup and overlap read only the sketch table — one row per increment, so
even a decade of daily feeds is ~4k rows; the triangular prior-union join
in ``feed_overlap`` is O(runs²) on kilobyte rows, driver-trivial.

Reference parity: extends the reference's run-level dataset stats
(`src/ids/data_loader.py:175-219` null/dup/label accounting, recomputed
from scratch every run) to stats that ACCUMULATE across runs without
re-reading — the piece the reference's single-box design never needed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SKETCH_STATE = "sketch_state"
HLL_LGK = 14  # ~0.8% rel std error, 16 KiB/sketch
KLL_K = 200  # ~1.3% rank error, ~3 KiB/sketch
R_DUPLICATE_FEED = "R090"


def increment_sketch_row(clips: DataFrame, run_id: str) -> DataFrame:
    """One row of mergeable sketches for an increment — payload-free.

    Single wide agg over the metadata columns (column pruning keeps
    ``bytes`` out of the scan); partial aggregation means each task ships
    one ~20 KiB partial, not rows."""
    return clips.agg(
        F.lit(run_id).alias("run_id"),
        F.count("*").alias("n_rows"),
        F.hll_sketch_agg("clip_id", F.lit(HLL_LGK)).alias("hll_clip_id"),
        F.hll_sketch_agg("transcript", F.lit(HLL_LGK)).alias("hll_transcript"),
        F.kll_sketch_agg_bigint(
            F.col("dur_ms").cast("long"), F.lit(KLL_K)).alias("kll_dur_ms"),
        F.kll_sketch_agg_bigint(
            F.col("sr_hz").cast("long"), F.lit(KLL_K)).alias("kll_sr_hz"),
    )


def write_increment_sketches(
    spark: SparkSession, clips: DataFrame, out_dir: str, run_id: str
) -> None:
    """Append the increment's sketch row to ``{out_dir}/sketch_state``.

    ``recorded_at`` orders increments for the prior-union in
    ``feed_overlap`` (wall-clock is fine: increments are sequential by
    construction — each ``validate_increment`` call is one)."""
    row = increment_sketch_row(clips, run_id) \
        .withColumn("recorded_at", F.lit(float(time.time())))
    row.coalesce(1).write.mode("append").parquet(f"{out_dir}/{SKETCH_STATE}")


def corpus_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """Corpus-wide stats folded from every increment's sketches.

    Returns one row: total_rows, distinct clip_id / transcript estimates,
    a duplicate_ratio (1 − distinct/total — the corpus-lifetime analog of
    the per-run uniqueness check), and dur_ms quantiles (p50/p95/p99)
    merged across runs. Reads only the sketch table."""
    st = spark.read.parquet(f"{out_dir}/{SKETCH_STATE}")
    hll = st.agg(
        F.sum("n_rows").alias("total_rows"),
        # allowDifferentLgConfigK: the union agg's internal sketch defaults
        # to lgK=12; our per-increment sketches are lgK=14 (union degrades
        # to the smaller K — documented DataSketches behavior)
        F.hll_sketch_estimate(
            F.hll_union_agg("hll_clip_id", F.lit(True)))
        .alias("distinct_clip_ids"),
        F.hll_sketch_estimate(
            F.hll_union_agg("hll_transcript", F.lit(True)))
        .alias("distinct_transcripts"),
        F.count("*").alias("n_increments"),
    )
    # KLL merge is a two-arg scalar (no agg form): fold the per-increment
    # sketches driver-side — one kilobyte-sized row per increment, so this
    # is bounded by the number of runs, never the corpus. An increment
    # sketched over 0 rows (or all-null dur_ms) stores an EMPTY 8-byte KLL
    # buffer — flags byte 3 carries the DataSketches EMPTY bit — which
    # kll_sketch_get_quantile rejects at runtime; filter those (and nulls)
    # out, and with none left the quantiles are an explicit NULL "no
    # sketches yet" result instead of a crash (round-5 ADVICE).
    def _usable(buf) -> bool:
        if buf is None:
            return False
        b = bytes(buf)
        return len(b) > 8 and not (b[3] & 0x01)

    kll_rows = [
        r["kll_dur_ms"]
        for r in st.select("kll_dur_ms").collect()
        if _usable(r["kll_dur_ms"])
    ]
    if kll_rows:
        merged = F.lit(bytearray(kll_rows[0]))
        for s in kll_rows[1:]:
            merged = F.kll_sketch_merge_bigint(merged, F.lit(bytearray(s)))
        q50 = F.kll_sketch_get_quantile_bigint(merged, F.lit(0.5))
        q95 = F.kll_sketch_get_quantile_bigint(merged, F.lit(0.95))
        q99 = F.kll_sketch_get_quantile_bigint(merged, F.lit(0.99))
    else:
        q50 = q95 = q99 = F.lit(None).cast("long")
    return hll.select(
        "*",
        q50.alias("dur_ms_p50"),
        q95.alias("dur_ms_p95"),
        q99.alias("dur_ms_p99"),
        F.when(
            F.coalesce(F.col("total_rows"), F.lit(0)) > 0,
            F.lit(1.0) - F.col("distinct_clip_ids") / F.col("total_rows"),
        ).alias("duplicate_ratio"),
    )


def feed_overlap(
    spark: SparkSession, out_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Per-increment id overlap against the union of all PRIOR increments.

    Returns (run_id, recorded_at, n_rows, est_ids, prior_est, overlap_est,
    overlap_ratio, rule_id, passed) ordered by recorded_at; the first
    increment has no prior (overlap 0). ``passed`` is false where
    overlap_ratio > threshold — a re-delivered feed. Triangular self-join
    over the runs table: O(runs²) kilobyte rows, all-JVM."""
    st = spark.read.parquet(f"{out_dir}/{SKETCH_STATE}") \
        .select("run_id", "recorded_at", "n_rows", "hll_clip_id")
    a = st.alias("a")
    b = st.alias("b")
    # strict composite (recorded_at, run_id) ordering: two increments
    # written with EQUAL wall-clock timestamps (coarse clock, skewed
    # drivers, restored state) would each be invisible in the other's
    # prior union under a bare recorded_at '<' — a re-delivered feed
    # landing in the tie would evade R090. The run_id tiebreak makes
    # exactly one of them prior to the other (round-5 ADVICE).
    is_prior = (F.col("b.recorded_at") < F.col("a.recorded_at")) | (
        (F.col("b.recorded_at") == F.col("a.recorded_at"))
        & (F.col("b.run_id") < F.col("a.run_id"))
    )
    prior = (
        a.join(b, is_prior, "left")
        .groupBy("a.run_id", "a.recorded_at", "a.n_rows", "a.hll_clip_id")
        .agg(F.hll_union_agg("b.hll_clip_id", F.lit(True)).alias("prior_hll"))
    )
    est = prior.select(
        F.col("run_id"),
        F.col("recorded_at"),
        F.col("n_rows"),
        F.hll_sketch_estimate("hll_clip_id").alias("est_ids"),
        F.when(F.col("prior_hll").isNull(), F.lit(0.0))
        .otherwise(F.hll_sketch_estimate("prior_hll")).alias("prior_est"),
        F.when(F.col("prior_hll").isNull(), F.lit(0.0))
        .otherwise(
            F.hll_sketch_estimate("hll_clip_id")
            + F.hll_sketch_estimate("prior_hll")
            - F.hll_sketch_estimate(
                F.hll_union("hll_clip_id", "prior_hll", True))
        ).alias("overlap_est"),
    )
    return est.select(
        "*",
        F.greatest(F.lit(0.0), F.col("overlap_est"))
        .alias("_ov"),
    ).select(
        "run_id", "recorded_at", "n_rows", "est_ids", "prior_est",
        "overlap_est",
        (F.col("_ov") / F.greatest(F.col("est_ids"), F.lit(1.0)))
        .alias("overlap_ratio"),
    ).select(
        "*",
        F.lit(R_DUPLICATE_FEED).alias("rule_id"),
        (F.col("overlap_ratio") <= F.lit(threshold)).alias("passed"),
    ).orderBy("recorded_at", "run_id")

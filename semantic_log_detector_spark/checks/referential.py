"""Referential integrity clips ↔ transcripts (SURVEY.md J1).

Reference: the id↔metadata side dicts of `src/detection/vector_db.py:65-66,
139-148` — an O(1) driver-side lookup that becomes a distributed join here.
Three rules:

- R030: clip has no transcript row (left_anti clips → transcripts)
- R031: transcript row is an orphan (left_anti transcripts → clips)
- R032: transcript text mismatch (inner join, equality per input_hint)

Join strategy is explicit (north_rule): ``strategy='auto'`` broadcasts the
transcript side when its *estimated* size fits `autoBroadcastJoinThreshold`
(or when forced via 'broadcast'); otherwise leaves it to sort-merge + AQE.
At 10^12 clips the transcripts dim is same-order ⇒ sort-merge; both sides
shuffle on clip_id once, and all three rules reuse that single co-partition
via a full_outer join (one shuffle, not three).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import CheckResult, RunContext, ensure_part_id, part_row_counts, verdicts_from_violations

R_MISSING = "R030_transcript_missing"
R_ORPHAN = "R031_transcript_orphan"
R_MISMATCH = "R032_transcript_mismatch"


def referential_check(
    clips: DataFrame,
    transcripts: DataFrame,
    ctx: RunContext,
    strategy: str = "auto",
) -> CheckResult:
    clips = ensure_part_id(clips, ctx)
    left = clips.select("clip_id", ctx.part_col, F.col("transcript").alias("_t_clip"))
    # transcripts get their part_id from their own clip_id (same hash) so the
    # orphan direction is partition-prunable too: a wave runs clips[parts W]
    # against transcripts[parts W] with no cross-wave false orphans.
    right = transcripts.select(
        F.col("clip_id").alias("t_clip_id"),
        F.col("transcript").alias("_t_side"),
        F.pmod(F.xxhash64("clip_id"), F.lit(ctx.num_parts)).cast("int").alias("_t_part"),
    )
    if strategy == "broadcast":
        right = F.broadcast(right)
    elif strategy == "auto":
        # leave to Catalyst/AQE: broadcasts under autoBroadcastJoinThreshold,
        # sort-merge otherwise (AQE can still convert at runtime).
        pass
    elif strategy != "sort_merge":
        raise ValueError(f"unknown join strategy {strategy!r}")

    # ONE full_outer join on the key serves all three rules (single shuffle).
    j = left.join(right, left["clip_id"] == right["t_clip_id"], "full_outer")

    missing = j.filter(F.col("t_clip_id").isNull()).select(
        F.col("clip_id"),
        F.col(ctx.part_col),
        F.lit(R_MISSING).alias("rule_id"),
        F.lit(None).cast("string").alias("observed"),
        F.lit("transcript row exists").alias("expected"),
        F.lit("Medium").alias("severity"),
        F.lit("clip has no transcript row").alias("explanation"),
    )
    orphan = j.filter(F.col("clip_id").isNull()).select(
        F.col("t_clip_id").alias("clip_id"),
        F.col("_t_part").alias(ctx.part_col),
        F.lit(R_ORPHAN).alias("rule_id"),
        F.col("t_clip_id").cast("string").alias("observed"),
        F.lit("clip row exists").alias("expected"),
        F.lit("Medium").alias("severity"),
        F.lit("transcript row references unknown clip").alias("explanation"),
    )
    mismatch = j.filter(
        F.col("clip_id").isNotNull()
        & F.col("t_clip_id").isNotNull()
        & ~F.col("_t_clip").eqNullSafe(F.col("_t_side"))
    ).select(
        F.col("clip_id"),
        F.col(ctx.part_col),
        F.lit(R_MISMATCH).alias("rule_id"),
        F.substring(F.coalesce(F.col("_t_side"), F.lit("∅")), 1, 64).alias("observed"),
        F.substring(F.coalesce(F.col("_t_clip"), F.lit("∅")), 1, 64).alias("expected"),
        F.lit("High").alias("severity"),
        F.lit("transcript text differs between tables").alias("explanation"),
    )
    violations = (
        missing.unionByName(orphan).unionByName(mismatch)
        .select(
            F.lit(ctx.run_id).alias("run_id"),
            F.col(ctx.part_col).cast("int").alias("part_id"),
            "rule_id",
            "clip_id",
            F.lit("transcript").alias("column"),
            "observed",
            "expected",
            "severity",
            "explanation",
        )
    )
    verdicts = verdicts_from_violations(
        violations.filter(F.col("part_id").isNotNull()).withColumnRenamed("part_id", ctx.part_col),
        part_row_counts(clips, ctx),
        ctx,
        [R_MISSING, R_ORPHAN, R_MISMATCH],
    )
    return CheckResult("referential", verdicts, violations)

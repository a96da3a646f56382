"""Quarantine split: route violating rows out of the corpus, keep the rest.

The step after validation: a suite produced explainable violation rows
(rule_id, clip_id, observed, expected) — downstream training wants the
CLEAN view, operators want the quarantined rows WITH the reasons they were
pulled. (The reference stops at flagging — anomalies land in a report,
src/ids/pipeline.py:119-141; routing flagged rows out of the serving path
is left to the caller. Here it is a first-class, scale-safe stage.)

Scale: the violating-id side is sparse by construction (violation rows,
not the corpus — percent-level at worst), so the per-id aggregation is
cheap and AQE promotes the join to broadcast when it fits; nothing here
forces a broadcast of something unbounded. The corpus is scanned once per
returned view (Spark can't split one scan into two sinks without
persisting the full corpus, which at 100 TB is worse than a second scan —
callers writing both views should just write them; the scans pipeline).

Only row-attributable violations quarantine (clip_id IS NOT NULL):
partition-level findings (drift R050/R051) describe a distribution, not a
row — quarantining every clip of a drifted partition is a policy decision
the caller can make explicitly by passing those part_ids as a filter
upstream, not a default this stage silently applies.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuarantineResult:
    """clean ∪ quarantined == input (by id); intersection empty.
    `quarantined` carries `quarantine_rules` (sorted distinct rule ids)
    and `n_violations` alongside every original column."""

    clean: DataFrame
    quarantined: DataFrame


def split_quarantine(
    clips: DataFrame,
    violations: DataFrame,
    id_col: str = "clip_id",
    rules: list[str] | None = None,
    severities: list[str] | None = None,
) -> QuarantineResult:
    """Split ``clips`` into (clean, quarantined) by the suite's violation
    rows. ``rules`` / ``severities`` scope WHICH violations quarantine
    (default: every row-attributable one) — e.g. quarantine only Critical
    decode failures but keep Medium DC-offset clips in the corpus.

    A clip named by several rules appears once, annotated with the sorted
    distinct rule set — operators triage by combination ("undecodable AND
    duplicate id" is a different incident than either alone)."""
    v = violations.filter(F.col("clip_id").isNotNull())
    if rules is not None:
        v = v.filter(F.col("rule_id").isin(list(rules)))
    if severities is not None:
        v = v.filter(F.col("severity").isin(list(severities)))
    per_id = v.groupBy(F.col("clip_id").alias("__qid")).agg(
        F.sort_array(F.collect_set("rule_id")).alias("quarantine_rules"),
        F.count(F.lit(1)).alias("n_violations"),
    )
    on = F.col(id_col) == F.col("__qid")
    quarantined = clips.join(per_id, on, "inner").drop("__qid")
    clean = clips.join(per_id, on, "left_anti")
    return QuarantineResult(clean=clean, quarantined=quarantined)

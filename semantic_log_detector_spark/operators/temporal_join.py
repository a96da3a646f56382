"""Temporal join operators Spark lacks natively: as-of join, interval
range join, sessionization — each expressed as shuffle-minimal DataFrame
compositions (no BroadcastNestedLoopJoin, no Python UDFs).

The reference correlates log events by recency and proximity (rolling
drift monitor `src/monitoring/drift.py:18-47`, explanation neighbors
`src/detection/explanation_engine.py:23-77`); a training-data event
pipeline needs the general operators:

- ``asof_join``: for each left row, the most recent right row at-or-before
  its timestamp (per key). Implemented with the union + last(ignorenulls)
  window trick: tag both sides, union, and run ONE window pass partitioned
  by key ordered by (ts, side) — a single hash shuffle on the key, zero
  join explosion, O(n log n) per partition. The naive inequality join is a
  range-scan per row and falls off a cliff at 10^12 rows; this shape is
  the standard scalable as-of (same plan family Flink/kdb use).
- ``range_interval_join``: probe rows against anchor intervals
  [lo, hi] per key. Buckets timestamps into fixed-width cells; anchors
  explode to every cell their interval overlaps (bounded by
  interval/bucket_width), probes land in exactly one cell, then an
  EQUI-join on (key, cell) + exact predicate. Catalyst gets a hash join
  it can shuffle/broadcast instead of a nested loop; no dedup needed
  because each probe has exactly one cell.
- ``sessionize``: gap-based session ids via lag + running sum — the
  batch twin of the streaming session window.

All timestamp math is in microseconds via ``unix_micros`` so the DuckDB
oracles (``epoch_us``) agree bit-for-bit at boundaries.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)


def _us(col_name: str):
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns. The NTZ
    cast interprets the wall clock in the session timezone — the engine
    session pins spark.sql.session.timeZone=UTC (session.py), so this
    equals DuckDB's naive epoch_us and all cross-engine time math agrees."""
    return F.unix_micros(F.col(col_name).cast("timestamp"))

def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
    suffix: str = "_matched",
    skew_stats: dict | None = None,
    warn_key_rows: int = 10_000_000,
) -> DataFrame:
    """Left as-of join: every left row + the payload of the single right
    row with the greatest ``right_ts`` ≤ ``left_ts`` for the same key
    (direction='backward'; 'forward' takes the smallest right_ts ≥
    left_ts). Unmatched left rows keep NULL payload (left-join
    semantics).

    Determinism: if multiple right rows share (key, right_ts), the one
    with the greatest first payload column wins — pre-aggregate the right
    side if that tie-break is not meaningful for your data.

    Scale shape: one shuffle on ``key_cols`` (the union's window), map-side
    nothing else. Skewed keys behave like any window over a hot key —
    AQE cannot split a window partition, so pre-filter or pre-aggregate
    degenerate keys upstream. A degenerate key degrades LOUDLY, not into
    a silent straggler task: pass a ``skew_stats`` dict (the same opt-in
    device as the dedup bucket guards) and ONE eager agg over the unioned
    key counts fills it (``hot_key``, ``hot_key_rows``, ``n_keys``) and
    logs a WARNING when the hottest key exceeds ``warn_key_rows`` — the
    row count one window partition must sort. With ``skew_stats=None``
    (default) no extra job runs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    out_payload = [f"{c}{suffix}" for c in right_payload]
    # union schema: left columns + tagged right payload (+ right ts for the caller)
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        _us(left_ts).alias("__us"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(o)
          for c, o in zip(right_payload, out_payload)],
    )
    r_tagged = right.select(
        *[F.col(k) if k in right.columns else F.lit(None).alias(k) for k in key_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in key_cols],
        F.lit(0).alias("__side"),
        _us(right_ts).alias("__us"),
        *[F.col(c).alias(o) for c, o in zip(right_payload, out_payload)],
    ).select(*lcols, "__side", "__us", *out_payload)
    u = l_tagged.unionByName(r_tagged)
    if isinstance(skew_stats, dict):
        hot = (
            u.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.max("__n").alias("hot_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max_by(F.struct(*key_cols), F.col("__n")).alias("hot_key"),
            )
            .first()
        )
        skew_stats.update(
            {
                "hot_key": None if hot["hot_key"] is None
                else hot["hot_key"].asDict(),
                "hot_key_rows": int(hot["hot_rows"] or 0),
                "n_keys": int(hot["n_keys"]),
                "warn_key_rows": int(warn_key_rows),
            }
        )
        if skew_stats["hot_key_rows"] > warn_key_rows:
            _LOG.warning(
                "asof_join: hot key %s carries %d rows (> warn_key_rows=%d) — "
                "one window partition must sort all of them (AQE cannot split "
                "a window partition); pre-aggregate or pre-filter that key "
                "upstream",
                skew_stats["hot_key"], skew_stats["hot_key_rows"], warn_key_rows,
            )
    if direction == "backward":
        # right rows (side 0) sort before left rows at equal ts → ties are
        # INCLUSIVE (right_ts == left_ts matches), like DuckDB ASOF >=
        order = [F.col("__us").asc(), F.col("__side").asc()] + [
            F.col(c).asc_nulls_first() for c in out_payload[:1]
        ]
        frame = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        pick = {o: F.last(o, ignorenulls=True).over(frame) for o in out_payload}
    else:
        order = [F.col("__us").asc(), F.col("__side").desc()] + [
            F.col(c).desc_nulls_last() for c in out_payload[:1]
        ]
        frame = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
            Window.currentRow, Window.unboundedFollowing
        )
        pick = {o: F.first(o, ignorenulls=True).over(frame) for o in out_payload}
    matched = u.select(
        *lcols, "__side", *[pick[o].alias(o) for o in out_payload]
    )
    return matched.filter(F.col("__side") == 1).drop("__side")


def range_interval_join(
    probe: DataFrame,
    anchors: DataFrame,
    key_cols: list[str],
    probe_ts: str,
    anchor_lo: str,
    anchor_hi: str,
    bucket_s: int = 600,
    drop_stats: dict | None = None,
    warn_cells_per_anchor: int = 1_000,
) -> DataFrame:
    """Inner join of probe rows onto anchor intervals: all (anchor, probe)
    pairs with ``anchor_lo ≤ probe_ts ≤ anchor_hi`` and equal keys —
    without a nested-loop join.

    ``anchor_lo``/``anchor_hi`` are timestamp COLUMN NAMES on ``anchors``.
    ``bucket_s`` is the cell width; each anchor explodes to
    ``(hi-lo)/bucket_s + 1`` cells, so the explode factor is bounded only
    by the caller's interval ≫ bucket discipline — a month-long interval
    at the default 600 s bucket quietly fans out ~4,300× per anchor. The
    factor is therefore OBSERVABLE through the same opt-in device as the
    dedup bucket guards: pass a ``drop_stats`` dict and ONE eager agg over
    the (typically small) anchor side fills it (``anchor_cells_max``,
    ``anchor_cells_avg``, ``anchor_cells_total``, ``n_anchors``,
    ``anchors_over_warn``) and logs a WARNING when any anchor exceeds
    ``warn_cells_per_anchor`` cells. With ``drop_stats=None`` (default)
    no extra job runs. Nothing is ever dropped either way — this is
    accounting, not a cap.

    Columns collide → prefix anchor columns yourself before calling.
    Output: probe columns + anchor columns.
    """
    b_us = int(bucket_s) * 1_000_000
    p = probe.withColumn(
        "__cell", (_us(probe_ts) / F.lit(b_us)).cast("long")
    )
    if isinstance(drop_stats, dict):
        n_cells = (
            (_us(anchor_hi) / F.lit(b_us)).cast("long")
            - (_us(anchor_lo) / F.lit(b_us)).cast("long")
            + F.lit(1)
        )
        row = anchors.agg(
            F.max(n_cells).alias("mx"),
            F.avg(n_cells).alias("avg"),
            F.sum(n_cells).alias("tot"),
            F.count(F.lit(1)).alias("n"),
            F.sum((n_cells > warn_cells_per_anchor).cast("long")).alias("over"),
        ).first()
        drop_stats.update(
            {
                "anchor_cells_max": int(row["mx"] or 0),
                "anchor_cells_avg": float(row["avg"] or 0.0),
                "anchor_cells_total": int(row["tot"] or 0),
                "n_anchors": int(row["n"]),
                "anchors_over_warn": int(row["over"] or 0),
                "warn_cells_per_anchor": int(warn_cells_per_anchor),
            }
        )
        if drop_stats["anchors_over_warn"]:
            _LOG.warning(
                "range_interval_join: %d of %d anchors explode to more than "
                "%d cells each (max %d, bucket_s=%d) — the equi-join fans "
                "out by that factor; widen bucket_s toward the interval "
                "width or split degenerate intervals upstream",
                drop_stats["anchors_over_warn"], drop_stats["n_anchors"],
                warn_cells_per_anchor, drop_stats["anchor_cells_max"],
                bucket_s,
            )
    a = anchors.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                (_us(anchor_lo) / F.lit(b_us)).cast("long"),
                (_us(anchor_hi) / F.lit(b_us)).cast("long"),
            )
        ),
    )
    joined = p.join(a, [*key_cols, "__cell"]).filter(
        (_us(probe_ts) >= _us(anchor_lo))
        & (_us(probe_ts) <= _us(anchor_hi))
    )
    return joined.drop("__cell")


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: int = 1800,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds ``gap_s``. Adds ``session_seq`` (1-based
    per key, in time order). One shuffle on the key; the two window
    passes (lag, running sum) share the same partitioning so Catalyst
    plans a single exchange.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    us = _us(ts_col)
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | ((us - prev) > F.lit(int(gap_s) * 1_000_000)), 1
    ).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

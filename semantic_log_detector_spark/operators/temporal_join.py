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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



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
    degenerate keys upstream.
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
) -> DataFrame:
    """Inner join of probe rows onto anchor intervals: all (anchor, probe)
    pairs with ``anchor_lo ≤ probe_ts ≤ anchor_hi`` and equal keys —
    without a nested-loop join.

    ``anchor_lo``/``anchor_hi`` are timestamp COLUMN NAMES on ``anchors``.
    ``bucket_s`` is the cell width; each anchor explodes to
    ``(hi-lo)/bucket_s + 1`` cells (keep the interval-to-bucket ratio
    small — the explode factor is logged nowhere because it is bounded by
    construction and visible in the plan's generator).

    Columns collide → prefix anchor columns yourself before calling.
    Output: probe columns + anchor columns.
    """
    b_us = int(bucket_s) * 1_000_000
    p = probe.withColumn(
        "__cell", (_us(probe_ts) / F.lit(b_us)).cast("long")
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

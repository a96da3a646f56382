"""Time-aware operators (SURVEY.md §2.5 W1–W9) as batch window functions.

The reference keeps in-process deques (`src/detection/time_aware.py:38-52`)
and per-IP timestamp lists (`src/rules/engine.py:54-77`); here each becomes
a Spark window spec or time bucket. Event-time semantics (the reference
silently uses arrival time — SURVEY.md W5 note) are explicit: every helper
takes the event-time column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from .text import clamp


def sliding_window(order_cols: list, partition_cols: list | None = None,
                   size: int = 100) -> WindowSpec:
    """W1: trailing row window of `size` (deque maxlen=100 analog)."""
    w = Window.orderBy(*order_cols)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return w.rowsBetween(-(size - 1), 0)


def contextual_adjustment(score: Column, w: WindowSpec) -> Column:
    """W2 (time_aware.py:80-112): z-score of the current score against its
    trailing window → adjustment factor clamped to [0.5, 2.0] → ×score."""
    mean = F.avg(score).over(w)
    std = F.stddev_samp(score).over(w)
    z = F.when(std > 0, (score - mean) / std).otherwise(F.lit(0.0))
    factor = clamp(F.lit(1.0) + z / 3.0, 0.5, 2.0)
    return score * factor


def recency_decay(ts: Column, now: Column, rate: float = 0.95,
                  floor: float = 0.1) -> Column:
    """W3 (time_aware.py:68-78): 0.95^Δhours, floored at 0.1."""
    dh = (now.cast("double") - ts.cast("double")) / 3600.0
    return F.greatest(F.pow(F.lit(rate), dh), F.lit(floor))


def burst_flag(score: Column, order_cols: list, partition_cols: list | None = None,
               recent: int = 10, window: int = 100, ratio: float = 2.0) -> Column:
    """W4 (time_aware.py:114-125): mean(last `recent`) > ratio × mean(rest)."""
    base = Window.partitionBy(*(partition_cols or [])).orderBy(*order_cols)
    w_recent = base.rowsBetween(-(recent - 1), 0)
    w_rest = base.rowsBetween(-(window - 1), -recent)
    m_recent = F.avg(score).over(w_recent)
    m_rest = F.avg(score).over(w_rest)
    return m_rest.isNotNull() & (m_rest > 0) & (m_recent > ratio * m_rest)


def windowed_count(df: DataFrame, ts: str, key: str, window_s: int = 60,
                   min_count: int = 5, predicate: Column | None = None) -> DataFrame:
    """W5 (rules/engine.py:54-77): per-key count in tumbling event-time
    buckets; rows meeting `min_count` are alerts. Uses floor(epoch/window)
    buckets (Catalyst-native, oracle-friendly); for streaming use
    `F.window` + watermark instead."""
    d = df.filter(predicate) if predicate is not None else df
    bucket = F.floor(F.col(ts).cast("double") / window_s).alias("bucket")
    return (
        d.groupBy(F.col(key), bucket)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def temporal_features(ts: Column) -> list[Column]:
    """W8 (time_aware.py:137-171): normalized calendar + sin/cos encodings.
    day-of-week uses ISO Monday=0 explicitly (Spark's dayofweek is
    Sunday=1 — normalized here so oracles agree)."""
    hour = F.hour(ts).cast("double")
    minute = F.minute(ts).cast("double")
    dow = ((F.dayofweek(ts) + 5) % 7).cast("double")  # Monday=0
    day = F.dayofmonth(ts).cast("double")
    month = F.month(ts).cast("double")
    two_pi = 2.0 * 3.141592653589793
    return [
        (hour / 23.0).alias("hour_norm"),
        (minute / 59.0).alias("minute_norm"),
        (dow / 6.0).alias("dow_norm"),
        ((day - 1) / 30.0).alias("day_norm"),
        ((month - 1) / 11.0).alias("month_norm"),
        F.sin(two_pi * hour / 24.0).alias("hour_sin"),
        F.cos(two_pi * hour / 24.0).alias("hour_cos"),
        F.sin(two_pi * dow / 7.0).alias("dow_sin"),
        F.cos(two_pi * dow / 7.0).alias("dow_cos"),
    ]


def topk_per_group(df: DataFrame, partition_cols: list, order_col: Column,
                   k: int, tiebreak: list | None = None) -> DataFrame:
    """W9/O2: rank-ordered top-k per group via row_number. `tiebreak`
    columns make results deterministic under ties (required for oracles)."""
    order = [order_col] + (tiebreak or [])
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

"""asof_join / range_interval_join / sessionize: semantics and plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.operators.temporal_join import (
    asof_join,
    range_interval_join,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:10"), 101.0),
            (3, "B", _ts("2024-01-01 10:00:07"), 50.0),
            (4, "C", _ts("2024-01-01 10:00:07"), 7.0),  # key with no quotes
        ],
        "trade_id int, sym string, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:03"), 99.5),
            ("A", _ts("2024-01-01 10:00:05"), 99.9),  # equal-ts: inclusive
            ("A", _ts("2024-01-01 10:00:09"), 100.5),
            ("B", _ts("2024-01-01 10:00:08"), 49.9),  # after B's trade
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r["bid_matched"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", ["bid"]
        ).collect()
    }
    assert out[1] == 99.9   # equal ts matches (inclusive, like DuckDB ASOF >=)
    assert out[2] == 100.5  # most recent preceding
    assert out[3] is None   # B's only quote is later
    assert out[4] is None   # no quotes for C at all (left-join semantics)


def test_asof_forward_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r["bid_matched"]
        for r in asof_join(
            trades, quotes, ["sym"], "ts", "ts", ["bid"], direction="forward"
        ).collect()
    }
    assert out[1] == 99.9   # equal ts inclusive forward too
    assert out[2] is None   # nothing at-or-after 10:00:10
    assert out[3] == 49.9   # next quote after B's trade
    assert out[4] is None


def test_asof_join_plan_has_no_join_node(trades_quotes, spark):
    # the whole operator is union + window: the plan must contain NO join
    # operator at all (that's the scalability claim)
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, ["sym"], "ts", "ts", ["bid"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_range_interval_join_matches_naive(spark):
    # 200 probes + 40 anchors with ±7-minute windows: bucketed equi-join
    # must equal the naive inequality join exactly, across bucket widths
    base = _ts("2024-03-01 00:00:00")
    probes = spark.createDataFrame(
        [(i, i % 5, base + dt.timedelta(seconds=37 * i)) for i in range(200)],
        "pid int, k int, ts timestamp",
    )
    anchors = spark.createDataFrame(
        [
            (j, j % 5,
             base + dt.timedelta(seconds=180 * j - 420),
             base + dt.timedelta(seconds=180 * j + 420))
            for j in range(40)
        ],
        "aid int, k int, lo timestamp, hi timestamp",
    )
    naive = (
        probes.join(anchors, "k")
        .filter((F.col("ts") >= F.col("lo")) & (F.col("ts") <= F.col("hi")))
        .select("pid", "aid")
    )
    expected = sorted((r["pid"], r["aid"]) for r in naive.collect())
    assert expected, "fixture must produce matches"
    for bucket_s in (60, 600, 3600):
        got = sorted(
            (r["pid"], r["aid"])
            for r in range_interval_join(
                probes, anchors, ["k"], "ts", "lo", "hi", bucket_s=bucket_s
            ).collect()
        )
        assert got == expected, f"bucket_s={bucket_s}"


def test_sessionize_gap_edges(spark):
    base = _ts("2024-05-01 12:00:00")
    rows = [
        # user 1: gap exactly 1800s does NOT split; 1801s does
        (1, base),
        (1, base + dt.timedelta(seconds=1800)),
        (1, base + dt.timedelta(seconds=1800 + 1801)),
        # user 2: single event
        (2, base),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(df, ["user_id"], "ts", gap_s=1800).collect()
    }
    assert out[(1, rows[0][1])] == 1
    assert out[(1, rows[1][1])] == 1   # gap == 1800 stays in-session
    assert out[(1, rows[2][1])] == 2   # gap > 1800 splits
    assert out[(2, base)] == 1

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


def test_range_join_explode_factor_surfaced(spark, caplog):
    # round-3 verdict #7: an anchor whose interval spans far more cells
    # than bucket_s intends must trigger the surfaced accounting — the
    # explode factor is never silent when the caller opts in
    import logging

    base = _ts("2024-03-01 00:00:00")
    probes = spark.createDataFrame(
        [(i, 0, base + dt.timedelta(seconds=600 * i)) for i in range(20)],
        "pid int, k int, ts timestamp",
    )
    anchors = spark.createDataFrame(
        [
            # a sane 10-minute interval …
            (0, 0, base, base + dt.timedelta(seconds=600)),
            # … and a month-long one: 31*86400/600 ≈ 4,465 cells
            (1, 0, base, base + dt.timedelta(days=31)),
        ],
        "aid int, k int, lo timestamp, hi timestamp",
    )
    stats = {}
    with caplog.at_level(
        logging.WARNING,
        logger="semantic_log_detector_spark.operators.temporal_join",
    ):
        out = range_interval_join(
            probes, anchors, ["k"], "ts", "lo", "hi",
            bucket_s=600, drop_stats=stats,
        )
        n = out.count()
    assert stats["n_anchors"] == 2
    assert stats["anchors_over_warn"] == 1
    assert stats["anchor_cells_max"] > 4000
    assert any("explode" in r.message for r in caplog.records)
    # accounting never changes the answer: month anchor matches all probes
    assert n == 2 + 20


def test_asof_hot_key_guard(spark, caplog):
    # round-3 verdict #8: a degenerate key degrades loudly — the opt-in
    # skew_stats dict carries the hottest key's row count and a WARNING
    # fires above the threshold, while the join result is unchanged
    import logging

    base = _ts("2024-04-01 00:00:00")
    left = spark.createDataFrame(
        [(i, "hot" if i < 900 else f"k{i}", base + dt.timedelta(seconds=i))
         for i in range(1000)],
        "lid int, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("hot", base, 1.0), ("k950", base, 2.0)],
        "sym string, ts timestamp, bid double",
    )
    stats = {}
    with caplog.at_level(
        logging.WARNING,
        logger="semantic_log_detector_spark.operators.temporal_join",
    ):
        out = asof_join(
            left, right, ["sym"], "ts", "ts", ["bid"],
            skew_stats=stats, warn_key_rows=500,
        ).collect()
    assert stats["hot_key"] == {"sym": "hot"}
    assert stats["hot_key_rows"] == 901  # 900 left + 1 right
    assert stats["n_keys"] == 101
    assert any("hot key" in r.message for r in caplog.records)
    matched = {r["lid"]: r["bid_matched"] for r in out}
    assert matched[0] == 1.0 and matched[950] == 2.0 and matched[999] is None

"""Duration-bucketed batch assembly: DuckDB oracle + invariants.

The whole assignment is SQL-expressible, so the oracle replays it in
DuckDB (same md5-60 shard device as hash_split's oracle) and the two
results must match row-for-row. On top: partitioning invariance, the
padding-waste win over naive batching, and remainder accounting.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from semantic_log_detector_spark.operators.batching import (
    batch_padding_stats,
    duration_batches,
)

BOUNDS = (1000, 2000, 4000, 8000, 16000)


@pytest.fixture(scope="module")
def clips_pdf():
    rng = np.random.default_rng(11)
    n = 5000
    return pd.DataFrame({
        "clip_id": [f"c{i:06d}" for i in range(n)],
        "dur_ms": np.concatenate([
            rng.integers(200, 30000, n - 3),
            [None, -5, 0],  # null / negative excluded, zero kept
        ]).astype(object),
    })


ORACLE_SQL = """
WITH base AS (
  SELECT clip_id, dur_ms,
         len(list_filter({bounds}, b -> b <= CAST(dur_ms AS DOUBLE))) AS bucket,
         CAST(('0x' || substr(md5(CAST(clip_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {shards} AS shard
  FROM clips WHERE dur_ms IS NOT NULL AND dur_ms >= 0
), seq AS (
  SELECT *, row_number() OVER (PARTITION BY bucket, shard
                               ORDER BY dur_ms, clip_id) AS rn
  FROM base
), asg AS (
  SELECT clip_id, dur_ms, bucket, shard,
         CAST(floor((rn - 1) / {bs}) AS INT) AS batch_index,
         bucket || '-' || shard || '-' || CAST(floor((rn - 1) / {bs}) AS INT) AS batch_id
  FROM seq
)
SELECT a.clip_id, a.dur_ms, a.bucket, a.shard, a.batch_index, a.batch_id,
       b.batch_n, b.batch_max_dur, b.batch_n = {bs} AS is_complete
FROM asg a JOIN (
  SELECT batch_id, CAST(count(*) AS INT) AS batch_n, max(dur_ms) AS batch_max_dur
  FROM asg GROUP BY batch_id
) b USING (batch_id)
ORDER BY a.clip_id
"""


def test_matches_duckdb_oracle(spark, clips_pdf):
    df = spark.createDataFrame(clips_pdf.astype({"dur_ms": "Int64"}),
                               "clip_id string, dur_ms long")
    got = (
        duration_batches(df, batch_size=16, boundaries=BOUNDS, num_shards=8)
        .orderBy("clip_id").toPandas()
    )
    con = duckdb.connect()
    con.register("clips", clips_pdf.astype({"dur_ms": "Int64"}))
    bounds_sql = "[" + ", ".join(f"{float(b)}" for b in BOUNDS) + "]"
    exp = con.execute(
        ORACLE_SQL.format(bounds=bounds_sql, shards=8, bs=16)
    ).fetchdf()
    assert len(got) == len(exp) == len(clips_pdf) - 2  # null + negative out
    for c in ["clip_id", "dur_ms", "bucket", "shard", "batch_index",
              "batch_id", "batch_n", "batch_max_dur", "is_complete"]:
        pd.testing.assert_series_equal(
            got[c].reset_index(drop=True),
            exp[c].reset_index(drop=True),
            check_dtype=False, check_names=False,
        )


def test_partitioning_invariance(spark, clips_pdf):
    pdf = clips_pdf.astype({"dur_ms": "Int64"})
    a = duration_batches(
        spark.createDataFrame(pdf, "clip_id string, dur_ms long").repartition(1)
    ).orderBy("clip_id").toPandas()
    b = duration_batches(
        spark.createDataFrame(pdf, "clip_id string, dur_ms long").repartition(17)
    ).orderBy("clip_id").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_bucketing_beats_naive_batching(spark, clips_pdf):
    """The point of the operator: duration-homogeneous batches waste far
    less padding than id-ordered (duration-agnostic) batches."""
    pdf = clips_pdf.dropna().astype({"dur_ms": "Int64"})
    pdf = pdf[pdf["dur_ms"] >= 0]
    df = spark.createDataFrame(pdf, "clip_id string, dur_ms long")
    asg = duration_batches(df, batch_size=16, boundaries=BOUNDS, num_shards=8)
    stats = batch_padding_stats(asg).collect()[0]
    assert stats["n_clips"] == len(pdf)

    # naive: batches of 16 in clip_id order (random w.r.t. duration)
    naive = pdf.sort_values("clip_id").reset_index(drop=True)
    naive["batch"] = naive.index // 16
    g = naive.groupby("batch")["dur_ms"]
    naive_waste = 1.0 - g.sum().sum() / (g.max() * g.size()).sum()
    assert stats["pad_waste"] < naive_waste * 0.35  # ≥ ~3× less padding


def test_remainders_kept_and_flagged(spark):
    df = spark.createDataFrame(
        [(f"x{i}", 500 + i) for i in range(10)], "clip_id string, dur_ms long"
    )
    got = duration_batches(df, batch_size=4, boundaries=BOUNDS, num_shards=1)
    rows = got.collect()
    assert len(rows) == 10  # nothing dropped
    assert {r["batch_n"] for r in rows} == {4, 2}
    assert all(r["is_complete"] == (r["batch_n"] == 4) for r in rows)


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", 1)], "clip_id string, dur_ms long")
    with pytest.raises(ValueError):
        duration_batches(df, boundaries=(2000, 1000))
    with pytest.raises(ValueError):
        duration_batches(df, batch_size=0)


def test_single_shuffle_plan(spark):
    """The whole assignment — bucket, shard, sequence, batch stats — costs
    exactly ONE shuffle: the batch-stats window partitions by
    (bucket, shard, batch_index), which the assignment window's
    hash(bucket, shard) already co-locates."""
    df = spark.createDataFrame(
        [(f"c{i}", 100 + i) for i in range(50)], "clip_id string, dur_ms long"
    )
    plan = duration_batches(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1

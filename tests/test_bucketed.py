"""Co-bucketed tables join with zero shuffle Exchanges; results identical
to the unbucketed join."""

import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.sources.bucketed import (
    join_is_shuffle_free,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    from semantic_log_detector_spark.sources.synth import (
        clips_table,
        transcripts_table,
    )

    root = tmp_path_factory.mktemp("buck")
    clips = clips_table(spark, 800, seed=3, with_bytes=False)
    tr = transcripts_table(spark, 800, seed=3)
    write_bucketed(clips, "bt_clips", str(root / "clips"), buckets=8)
    write_bucketed(tr, "bt_tr", str(root / "tr"), buckets=8)
    yield clips, tr
    spark.sql("DROP TABLE IF EXISTS bt_clips")
    spark.sql("DROP TABLE IF EXISTS bt_tr")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    bc = read_bucketed(spark, "bt_clips")
    bt = read_bucketed(spark, "bt_tr")
    # disable broadcast so the planner must choose sort-merge: the point
    # is the missing shuffle, not a broadcast short-circuit
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bc.join(bt.withColumnRenamed("transcript", "t2"), "clip_id")
        assert join_is_shuffle_free(j), "co-bucketed join still shuffles"
        # the unbucketed same join DOES shuffle — the device discriminates
        clips, tr = bucketed_pair
        ju = clips.join(tr.withColumnRenamed("transcript", "t2"), "clip_id")
        assert not join_is_shuffle_free(ju)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_bucketed_join_results_identical(spark, bucketed_pair):
    clips, tr = bucketed_pair
    bc = read_bucketed(spark, "bt_clips")
    bt = read_bucketed(spark, "bt_tr")
    a = (clips.join(tr.withColumnRenamed("transcript", "t2"), "clip_id")
         .agg(F.count("*"), F.bit_xor(F.xxhash64("clip_id", "t2"))).collect())
    b = (bc.join(bt.withColumnRenamed("transcript", "t2"), "clip_id")
         .agg(F.count("*"), F.bit_xor(F.xxhash64("clip_id", "t2"))).collect())
    assert a == b


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_pair):
    bc = read_bucketed(spark, "bt_clips")
    g = bc.groupBy("clip_id").agg(F.count("*").alias("n"))
    assert join_is_shuffle_free(g)

"""End-to-end training-data pipeline over the engine's own operators:

    synth corpus → validation suite → quarantine split → audio curation
    → augmentation (speed/noise/LUFS-norm) → duration-bucketed batches
    → WebDataset shard export → re-read → payload rules on the export.

One test, the whole journey — this is the composition a user of the
engine actually runs, and it catches interface drift between stages that
unit tests cannot (column names, null contracts, codec labels).
"""

import os

import numpy as np
import pyspark.sql.functions as F

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.drift import decode_stats
from semantic_log_detector_spark.operators.audio_curate import curate_audio_corpus
from semantic_log_detector_spark.operators.augment import AugSpec, augment_clips
from semantic_log_detector_spark.operators.batching import (
    batch_padding_stats,
    duration_batches,
)
from semantic_log_detector_spark.operators.dedup import unpersist_all
from semantic_log_detector_spark.plans.quarantine import split_quarantine
from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite
from semantic_log_detector_spark.sources.synth import clips_table, transcripts_table
from semantic_log_detector_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


def test_full_pipeline(spark, tmp_path):
    n = 3000
    clips = clips_table(spark, n)
    transcripts = transcripts_table(spark, n)
    out = str(tmp_path / "run")

    # 1. validate
    run_suite(spark, clips, transcripts, out, SuiteConfig())
    viol = spark.read.parquet(os.path.join(out, "violations"))

    # 2. quarantine: exact partition of the corpus
    qr = split_quarantine(clips, viol)
    n_clean, n_quar = qr.clean.count(), qr.quarantined.count()
    assert n_clean + n_quar == n
    assert qr.clean.join(qr.quarantined, "clip_id", "inner").count() == 0

    # 3. curate the clean corpus (speech + dup gates; loudness off = cheap)
    stats = {}
    kept = curate_audio_corpus(qr.clean, min_speech_ratio=0.05,
                               drop_stats=stats)
    kept_ids = kept.select("clip_id")
    assert 0 < kept_ids.count() <= n_clean

    # 4. augment the kept clips (join back to payloads)
    kept_clips = qr.clean.join(kept_ids, "clip_id")
    aug = augment_clips(
        kept_clips,
        specs=(
            AugSpec("sp0.9", "speed", {"factor": 0.9}),
            AugSpec("lufs23", "lufs_norm", {"target_lufs": -23.0}),
        ),
    ).persist()
    n_kept = kept_clips.count()
    assert aug.count() == 2 * n_kept  # accounting: n × k, no silent drops
    ok_aug = aug.filter("ok")
    # curated clips decoded for real once already — augmentation must too
    assert ok_aug.count() == 2 * n_kept

    # 5. duration-bucketed batches over the augmented corpus
    asg = duration_batches(ok_aug, batch_size=8)
    pstats = batch_padding_stats(asg).collect()[0]
    assert pstats["n_clips"] == ok_aug.count()
    assert pstats["pad_waste"] < 0.25

    # 6. export to WebDataset shards and read back
    shard_dir = str(tmp_path / "shards")
    write_webdataset(ok_aug, shard_dir, shards=4)
    back = read_webdataset(spark, shard_dir).persist()
    assert back.count() == ok_aug.count()
    # payload integrity: md5 of bytes survives the tar roundtrip
    a = ok_aug.select("clip_id", F.md5("bytes").alias("h"))
    b = back.select("clip_id", F.md5("bytes").alias("h"))
    assert a.join(b, ["clip_id", "h"]).count() == ok_aug.count()
    # transcripts rode through augmentation AND the shard roundtrip
    with_txt = back.filter(F.col("transcript").isNotNull()).count()
    src_txt = ok_aug.filter(F.col("transcript").isNotNull()).count()
    assert with_txt == src_txt > 0

    # 7. the exported corpus passes the engine's own payload rules:
    #    everything decodes, nothing clipped/silent/DC-biased/band-limited
    ctx = RunContext(run_id="e2e", num_parts=8)
    scored = back.withColumn(
        "part_id", F.pmod(F.xxhash64("clip_id"), F.lit(8)).cast("int")
    ).withColumn("dur_ms", F.col("dur_ms").cast("int"))
    st = decode_stats(scored, ctx)
    bad = st.filter(
        (F.col("kind") == "v")
        & F.col("feature").isin(
            "R060_decode", "R063_clipping", "R064_silence", "R065_dc_offset")
    ).count()
    assert bad == 0
    aug.unpersist(); back.unpersist(); unpersist_all(stats)

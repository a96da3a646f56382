"""Synthetic source: determinism, planted defects, decode invariants."""

import numpy as np
import pyspark.sql.functions as F

from semantic_log_detector_spark.functions.audio import decode_wav, encode_wav, snr_db
from semantic_log_detector_spark.sources.synth import clips_table, transcripts_table


def _fingerprint(df):
    return df.agg(
        F.bit_xor(F.xxhash64("clip_id", "sr_hz", "dur_ms", "codec", "transcript"))
    ).first()[0]


def test_deterministic_across_parallelism(spark, meta_4k):
    other = clips_table(spark, 4000, with_bytes=False, num_partitions=3)
    assert _fingerprint(meta_4k) == _fingerprint(other)


def test_planted_defect_rates(meta_4k):
    n = meta_4k.count()
    assert n == 4000
    dup_groups = meta_4k.groupBy("clip_id").count().filter("count > 1").count()
    assert 1 <= dup_groups <= 20
    assert 1 <= meta_4k.filter("sr_hz IS NULL").count() <= 40
    assert meta_4k.filter("sr_hz <= 0 OR sr_hz > 96000").count() >= 1
    assert meta_4k.filter("dur_ms < 0").count() >= 1
    codecs = {r[0] for r in meta_4k.select("codec").distinct().collect()}
    assert "pcm_s16le" in codecs and "vorbis??" in codecs


def test_codec_skew(meta_4k):
    freq = {r["codec"]: r["count"] for r in meta_4k.groupBy("codec").count().collect()}
    # pcm_s16le is the intentionally heavy key for the salted-agg tests:
    # ~55% of rows, > 4× any other codec
    assert freq["pcm_s16le"] / 4000 > 0.45
    assert freq["pcm_s16le"] > 4 * max(v for k, v in freq.items() if k != "pcm_s16le")


def test_wav_roundtrip_snr(clips_2k):
    rows = clips_2k.filter("codec = 'pcm_s16le'").limit(5).collect()
    for r in rows:
        pcm, sr = decode_wav(bytes(r["bytes"]))
        pcm2, sr2 = decode_wav(encode_wav(pcm, sr))
        assert sr2 == sr
        assert snr_db(pcm, pcm2) >= 30.0  # input_hint per-row invariant


def test_transcripts_table_has_orphans_and_gaps(spark):
    tr = transcripts_table(spark, 4000).cache()
    clips = clips_table(spark, 4000, with_bytes=False)
    orphans = tr.join(clips.select("clip_id"), "clip_id", "left_anti").count()
    missing = clips.join(tr.select("clip_id"), "clip_id", "left_anti").count()
    assert orphans >= 1 and missing >= 1
    tr.unpersist()


def test_part_id_stable(spark, meta_4k):
    # part_id must derive from clip_id only (never physical partitioning)
    a = meta_4k.select("clip_id", "part_id")
    b = clips_table(spark, 4000, with_bytes=False, num_partitions=5).select(
        "clip_id", "part_id"
    )
    assert a.exceptAll(b).count() == 0


def test_drifted_partition_spectrum(clips_2k):
    from semantic_log_detector_spark.functions.audio import clip_features

    from semantic_log_detector_spark.functions.flac import decode_flac

    from semantic_log_detector_spark.functions.audio import decode_clip

    rows = (
        clips_2k.filter(F.col("part_id").isin(7, 3))
        .select("part_id", "codec", "bytes")
        .collect()
    )
    cents = {7: [], 3: []}
    for r in rows:
        try:
            # dispatch on the codec label (real g711/adpcm/flac containers
            # now exist); the rare planted-truncated payload raises — skip,
            # exactly as the drift check turns it into a violation row
            pcm, sr = decode_clip(bytes(r["bytes"]), r["codec"])
        except (ValueError, NotImplementedError):
            continue
        cents[r["part_id"]].append(clip_features(pcm, sr)[-1])
    assert len(cents[7]) > 10 and len(cents[3]) > 10
    assert np.mean(cents[7]) > 1200  # drifted band 1500-3000 Hz
    assert np.mean(cents[3]) < 1200  # normal band 100-1000 Hz

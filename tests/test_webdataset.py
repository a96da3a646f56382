"""WebDataset tar-shard source/sink: pairing, header-only metadata,
roundtrip through the engine's own decode path."""

import os
import tarfile

import numpy as np
import pyspark.sql.functions as F
import pytest

from semantic_log_detector_spark.functions.audio import decode_clip, encode_wav
from semantic_log_detector_spark.sources.webdataset import (
    _wav_header_meta,
    read_webdataset,
    write_webdataset,
)


def _tone(sr=16000, dur_s=0.5, f=330.0, seed=1):
    t = np.arange(int(sr * dur_s)) / sr
    rng = np.random.default_rng(seed)
    return (0.4 * np.sin(2 * np.pi * f * t)
            + 0.03 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    import io

    for s in range(3):
        with tarfile.open(d / f"shard-{s:06d}.tar", "w") as tf:
            for k in range(4):
                key = f"clip_{s:02d}_{k:02d}"
                buf = encode_wav(_tone(f=300 + 40 * (s * 4 + k), seed=s * 4 + k),
                                 16000)
                info = tarfile.TarInfo(f"{key}.wav")
                info.size = len(buf)
                tf.addfile(info, io.BytesIO(buf))
                txt = f"transcript of {key}".encode()
                ti = tarfile.TarInfo(f"{key}.txt")
                ti.size = len(txt)
                tf.addfile(ti, io.BytesIO(txt))
            # one audio-only member (no transcript pair)
            buf = encode_wav(_tone(f=999, seed=99), 8000)
            info = tarfile.TarInfo(f"clip_{s:02d}_noscript.wav")
            info.size = len(buf)
            tf.addfile(info, io.BytesIO(buf))
    return str(d)


def test_wav_header_meta():
    buf = encode_wav(_tone(sr=22050, dur_s=1.0), 22050)
    sr, dur = _wav_header_meta(buf[:1024])
    assert sr == 22050 and abs(dur - 1000) <= 1
    assert _wav_header_meta(b"not a wav at all" * 4) == (None, None)


def test_read_pairs_and_metadata(spark, shard_dir):
    df = read_webdataset(spark, shard_dir)
    rows = {r["clip_id"]: r for r in df.collect()}
    assert len(rows) == 15  # 3 shards × (4 paired + 1 audio-only)
    r = rows["clip_00_01"]
    assert r["codec"] == "pcm_s16le" and r["sr_hz"] == 16000
    assert abs(r["dur_ms"] - 500) <= 1
    assert r["transcript"] == "transcript of clip_00_01"
    assert rows["clip_01_noscript"]["transcript"] is None
    # payloads decode through the engine's own path
    pcm, sr = decode_clip(r["bytes"], r["codec"])
    assert sr == 16000 and len(pcm) == 8000


def test_one_task_per_shard(spark, shard_dir):
    df = read_webdataset(spark, shard_dir)
    per_shard = {r["shard"]: r["n"] for r in
                 df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(per_shard) == 3 and set(per_shard.values()) == {5}


def test_roundtrip_write_read(spark, shard_dir, tmp_path):
    src = read_webdataset(spark, shard_dir)
    out = str(tmp_path / "export")
    n = write_webdataset(src, out, shards=2)
    assert n == 2
    assert sorted(os.listdir(out)) == ["shard-000000.tar", "shard-000001.tar"]
    back = read_webdataset(spark, out)
    a = src.select("clip_id", "transcript",
                   F.md5(F.hex("bytes")).alias("payload"))
    b = back.select("clip_id", "transcript",
                    F.md5(F.hex("bytes")).alias("payload"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_refuses_remote_uri(spark):
    with pytest.raises(ValueError, match="local/NFS"):
        read_webdataset(spark, "s3://bucket/shards")


def test_suite_runs_on_webdataset_corpus(spark, shard_dir, tmp_path):
    """The shard corpus flows into the validation suite unmodified: decode
    rules run on the tar payloads (all clean here)."""
    from semantic_log_detector_spark.checks.base import RunContext
    from semantic_log_detector_spark.checks.drift import decode_stats
    from semantic_log_detector_spark.sources.synth import with_part_id

    clips = with_part_id(read_webdataset(spark, shard_dir), num_parts=4)
    stats = decode_stats(clips, RunContext(run_id="wds", num_parts=4))
    assert stats.filter("kind = 'v'").count() == 0
    n_rows = stats.filter("kind = 'c' AND feature = 'rows'").agg(
        F.sum("cnt")).collect()[0][0]
    assert n_rows == 15

def test_flac_member_metadata(spark, tmp_path):
    """STREAMINFO gives .flac members header-only sr/dur, same contract as
    the WAV RIFF parse; garbage .flac leaves nulls for the row rules."""
    import io

    from semantic_log_detector_spark.functions.flac import encode_flac

    pcm = _tone(sr=22050, dur_s=1.0)
    buf = encode_flac(pcm, 22050)
    d = tmp_path / "wds_flac"
    d.mkdir()
    with tarfile.open(d / "shard-000000.tar", "w") as tf:
        info = tarfile.TarInfo("good.flac")
        info.size = len(buf)
        tf.addfile(info, io.BytesIO(buf))
        junk = b"fLaC" + b"\x00" * 3  # truncated: parse must not crash
        info = tarfile.TarInfo("bad.flac")
        info.size = len(junk)
        tf.addfile(info, io.BytesIO(junk))
    rows = {r["clip_id"]: r for r in read_webdataset(spark, str(d)).collect()}
    assert rows["good"]["sr_hz"] == 22050
    assert abs(rows["good"]["dur_ms"] - 1000) <= 1
    assert rows["good"]["codec"] == "flac"
    # the payload still decodes through the engine's own codec
    got, sr = decode_clip(bytes(rows["good"]["bytes"]), "flac")
    assert sr == 22050 and len(got) == len(pcm)
    assert rows["bad"]["sr_hz"] is None and rows["bad"]["dur_ms"] is None

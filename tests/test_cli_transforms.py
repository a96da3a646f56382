"""CLI transform family: segment / augment / features / wds-export /
wds-import — each drives its operator parquet-in → parquet-or-shards-out
with the no-silent-drops accounting printed. In-process main() calls reuse
the test session (the CLI never stops a session it did not create)."""

import os

from semantic_log_detector_spark.cli import main
from semantic_log_detector_spark.sources.synth import clips_table


def _corpus(spark, tmp_path, n=300):
    p = str(tmp_path / "clips")
    clips_table(spark, n).write.mode("overwrite").parquet(p)
    return p


def test_segment_augment_features(spark, tmp_path, capsys):
    src = _corpus(spark, tmp_path)

    assert main(["segment", "--input", src, "--out", str(tmp_path / "segs")]) == 0
    seg_out = capsys.readouterr().out
    assert "ok=" in seg_out and "not_ok=" in seg_out
    segs = spark.read.parquet(str(tmp_path / "segs"))
    assert segs.filter("ok").count() > 0
    assert {"clip_id", "src_clip_id", "bytes"} <= set(segs.columns)

    assert main(["augment", "--input", src, "--out", str(tmp_path / "aug"),
                 "--specs", "sp0.9,lufs-23"]) == 0
    aug = spark.read.parquet(str(tmp_path / "aug"))
    assert aug.count() == 2 * spark.read.parquet(src).count()

    assert main(["features", "--input", src, "--out", str(tmp_path / "f"),
                 "--cmvn"]) == 0
    stats = spark.read.parquet(str(tmp_path / "f") + "_cmvn")
    assert stats.count() == 13  # one row per MFCC coefficient


def test_wds_roundtrip(spark, tmp_path, capsys):
    src = _corpus(spark, tmp_path, n=100)
    shard_dir = str(tmp_path / "shards")
    assert main(["wds-export", "--input", src, "--out", shard_dir,
                 "--shards", "3"]) == 0
    assert sorted(f for f in os.listdir(shard_dir) if f.endswith(".tar"))

    back = str(tmp_path / "back")
    assert main(["wds-import", "--input", shard_dir, "--out", back]) == 0
    out = capsys.readouterr().out
    assert "imported=" in out
    # export skips null-payload rows (documented); everything else round-trips
    n_src_payload = spark.read.parquet(src).filter("bytes is not null").count()
    assert spark.read.parquet(back).count() == n_src_payload


def test_bad_aug_spec_exits(spark, tmp_path):
    src = _corpus(spark, tmp_path, n=10)
    import pytest

    with pytest.raises(SystemExit):
        main(["augment", "--input", src, "--out", str(tmp_path / "x"),
              "--specs", "wat9000"])

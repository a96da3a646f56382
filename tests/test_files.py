"""S8 extension dispatch (reference test_custom_data.py:13-24)."""

import json

import pytest

from semantic_log_detector_spark.sources.files import read_file


def test_csv_dispatch(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("clip_id,sr_hz\na,16000\nb,8000\n")
    df = read_file(spark, str(p))
    assert df.count() == 2
    assert set(df.columns) == {"clip_id", "sr_hz"}
    assert df.schema["sr_hz"].dataType.typeName() in ("integer", "long")


def test_jsonl_dispatch(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"clip_id": "a", "sr_hz": 16000}\n{"clip_id": "b", "sr_hz": 8000}\n')
    df = read_file(spark, str(p))
    assert df.count() == 2 and "clip_id" in df.columns


def test_standard_json_array_fallback(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text(json.dumps([
        {"clip_id": "a", "sr_hz": 16000},
        {"clip_id": "b", "sr_hz": 8000},
    ], indent=2))
    df = read_file(spark, str(p))  # not line-delimited → multiLine fallback
    assert df.count() == 2 and "clip_id" in df.columns


def test_parquet_and_dir_dispatch(spark, tmp_path):
    d = str(tmp_path / "tbl")
    spark.range(5).write.parquet(d)
    assert read_file(spark, d).count() == 5


def test_unsupported_extension(spark, tmp_path):
    p = tmp_path / "t.xlsx"
    p.write_text("nope")
    with pytest.raises(ValueError, match="unsupported file format"):
        read_file(spark, str(p))

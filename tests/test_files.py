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


def test_remote_uri_foreign_extension_raises(spark):
    # a URI-schemed path must not swallow a recognizable non-table file
    # extension into the parquet reader
    with pytest.raises(ValueError, match="unsupported file format"):
        read_file(spark, "hdfs://nn/logs/events.avro")
    with pytest.raises(ValueError, match="unsupported file format"):
        read_file(spark, "s3a://bucket/data/notes.txt")


def test_cli_curate_end_to_end(spark, tmp_path):
    """cli curate over a documents parquet writes the kept set + summary
    (get_spark getOrCreate reuses the test session)."""
    import json as _json

    from semantic_log_detector_spark.cli import main

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the field"),
            (2, "the quick brown fox jumps over the lazy dog in the field"),
            (3, "a completely different sentence about the engine and the tests"),
        ],
        ["doc_id", "text"],
    ).write.parquet(src)
    out = str(tmp_path / "out")
    rc = main([
        "curate", "--input", src, "--out", out,
        "--exact-pairs", "--jaccard-threshold", "0.5", "--min-quality", "0.0",
    ])
    assert rc == 0
    kept = spark.read.parquet(f"{out}/kept")
    ids = {r["id"] for r in kept.collect()}
    assert ids == {1, 3}  # doc 2 is the non-canonical exact dup
    summary = _json.loads((tmp_path / "out" / "curation_summary.json").read_text())
    assert summary["n_docs"] == 2 and summary["drop_stats"]["cc_converged"]


def test_cli_curate_with_benchmark_decontamination(spark, tmp_path):
    import json as _json

    from semantic_log_detector_spark.cli import main

    src = str(tmp_path / "docs2")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the field"),
            (2, "a completely different sentence about the engine and the tests"),
        ],
        ["doc_id", "text"],
    ).write.parquet(src)
    bench = str(tmp_path / "bench")
    spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog in the field")],
        ["doc_id", "text"],
    ).write.parquet(bench)
    out = str(tmp_path / "out2")
    rc = main([
        "curate", "--input", src, "--out", out, "--benchmark", bench,
        "--exact-pairs", "--jaccard-threshold", "0.5", "--min-quality", "0.0",
    ])
    assert rc == 0
    kept = spark.read.parquet(f"{out}/kept")
    assert {r["id"] for r in kept.collect()} == {2}  # doc 1 decontaminated
    summary = _json.loads((tmp_path / "out2" / "curation_summary.json").read_text())
    assert summary["drop_stats"]["decontaminated_docs"] == 1

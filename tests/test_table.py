"""Storage seam: read_table/write_table dispatch (Iceberg vs parquet)."""

import os

import pytest

from semantic_log_detector_spark.sources.table import (
    iceberg_available,
    read_table,
    write_table,
)


def test_parquet_roundtrip(spark, tmp_path):
    src = spark.range(100).selectExpr("id", "id * 2 as v")
    path = str(tmp_path / "tbl")
    write_table(src, path, mode="overwrite")
    back = read_table(spark, path)
    assert back.count() == 100
    assert set(back.columns) == {"id", "v"}
    write_table(src, path, mode="append")
    assert read_table(spark, path).count() == 200


def test_identifier_resolves_via_catalog(spark):
    spark.range(7).createOrReplaceTempView("seam_view")
    assert read_table(spark, "seam_view").count() == 7


def test_iceberg_dir_without_runtime_refuses(spark, tmp_path):
    # A directory with a metadata/ subdir is an Iceberg table; with no
    # runtime jar, reading its data files as plain parquet would surface
    # rows from old snapshots / delete files — must refuse, not mis-read.
    path = str(tmp_path / "icetbl")
    spark.range(5).write.parquet(path)
    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg table directory"):
            read_table(spark, path)

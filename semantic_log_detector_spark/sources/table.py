"""Thin storage layer: Iceberg catalog when available, parquet-dir fallback.

The north_rule input is "an Iceberg table of audio clip + transcript pairs";
this sandbox ships no Iceberg runtime jar, so the checks are written as
storage-agnostic DataFrame code (SURVEY.md §7.3 "Iceberg in-sandbox") and
ALL table I/O goes through this one seam:

- ``read_table(spark, ref)`` — ``ref`` may be a catalog identifier
  (``cat.db.tbl`` / a registered view name) resolved via ``spark.read.table``
  (which is how an Iceberg table is addressed once the catalog is
  configured), an Iceberg warehouse *directory* (detected by its
  ``metadata/`` subdir and read with ``format("iceberg")`` when the runtime
  is on the classpath), or a plain parquet directory.
- ``write_table(df, ref, mode)`` — identifier → ``writeTo`` (Iceberg v2
  append/replace semantics); path → parquet directory with identical
  partition semantics (the engine's partitioning is data-derived
  ``pmod(xxhash64(clip_id), P)``, never storage-assigned, so verdicts are
  byte-identical across backends).

Equivalent of the reference's storage dispatch (`src/ids/data_loader.py`
CSV-vs-parquet branch) recast for table catalogs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def _is_path(ref: str) -> bool:
    return "/" in ref or os.sep in ref


def _is_iceberg_dir(spark: SparkSession, ref: str) -> bool:
    """True when ``ref`` is a table directory with a ``metadata/`` subdir.

    Local paths use os.path; URI-schemed paths (hdfs://, s3a://, ...) go
    through the Hadoop FileSystem API — one exists() RPC — so a remote
    Iceberg warehouse directory is detected (and refused without the
    runtime) exactly like a local one, instead of being silently read as
    raw parquet with stale-snapshot/deleted rows."""
    if "://" not in ref:
        return os.path.isdir(os.path.join(ref, "metadata"))
    try:
        jvm = spark._jvm  # type: ignore[union-attr]
        hpath = jvm.org.apache.hadoop.fs.Path(ref.rstrip("/") + "/metadata")
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
        return bool(fs.exists(hpath) and fs.getFileStatus(hpath).isDirectory())
    except Exception:
        # unreachable filesystem / missing connector: let the downstream
        # reader raise its own (clearer) error for the actual read
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Resolve ``ref`` to a DataFrame: catalog identifier > Iceberg dir >
    parquet dir. Raises the underlying AnalysisException on a bad ref."""
    if not _is_path(ref):
        return spark.read.table(ref)
    if _is_iceberg_dir(spark, ref):
        if not iceberg_available(spark):
            # reading the warehouse dir as raw parquet would surface rows
            # from old snapshots and rows logically removed via delete
            # files — silently wrong contents, so refuse instead
            raise RuntimeError(
                f"{ref!r} is an Iceberg table directory but no Iceberg "
                "runtime is on the classpath; add "
                "iceberg-spark-runtime to spark.jars.packages (reading the "
                "data files as plain parquet would include stale/deleted rows)"
            )
        return spark.read.format("iceberg").load(ref)
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Write ``df`` to ``ref``. Identifier → Iceberg-style ``writeTo``;
    path → parquet directory (append/overwrite)."""
    if not _is_path(ref):
        writer = df.writeTo(ref)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(ref)

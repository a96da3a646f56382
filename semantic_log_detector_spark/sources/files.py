"""Extension-dispatch file source (SURVEY.md S8).

The reference loads user-supplied tables by extension — CSV via pandas,
.jsonl/.json with a line-delimited-then-standard fallback
(`test_custom_data.py:13-24`). Spark-first restatement: csv → header +
schema inference; json → native JSON-Lines reader, falling back to
``multiLine`` for standard JSON documents/arrays (the reader signals the
wrong mode with an all-``_corrupt_record`` schema, mirroring the
reference's ValueError retry); parquet / directories → the storage seam
(sources/table.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .table import read_table

# file extensions this source knowingly does NOT read; anything else
# (extensionless, trailing /, dotted directory names like db.db) is
# treated as a table directory and resolved by the storage seam
_FOREIGN_EXTS = (
    ".txt", ".log", ".tsv", ".dat", ".avro", ".xml",
    ".gz", ".bz2", ".zst", ".zip", ".arrow", ".feather",
)


def read_file(spark: SparkSession, path: str) -> DataFrame:
    """Load ``path`` by extension: .csv / .json / .jsonl / .orc /
    .parquet or a table directory. ValueError on an unsupported
    extension."""
    lower = path.lower()
    if lower.endswith(".csv"):
        return spark.read.csv(path, header=True, inferSchema=True)
    if lower.endswith(".orc"):
        # native columnar reader — same pushdown/pruning as parquet
        return spark.read.orc(path)
    if lower.endswith((".json", ".jsonl")):
        df = spark.read.json(path)
        if df.columns in ([], ["_corrupt_record"]):
            # not line-delimited → standard JSON document/array
            df = spark.read.option("multiLine", True).json(path)
        return df
    # remote/URI-schemed table paths (hdfs://, s3a://, dbfs:/...) are not
    # visible to os.path.isdir — delegate them to the storage seam like any
    # extensionless table directory (the spark-submit cluster --input path).
    # A recognizable NON-table file extension still raises: routing
    # s3a://.../events.avro into the parquet reader would produce an opaque
    # footer error (or garbage), not a format hint.
    has_scheme = "://" in path or lower.startswith("dbfs:/")
    if has_scheme and lower.rstrip("/").endswith(_FOREIGN_EXTS):
        raise ValueError(
            f"unsupported file format {path!r}: use .csv, .json/.jsonl, or parquet"
        )
    if lower.endswith(".parquet") or os.path.isdir(path) or has_scheme or "/" not in path:
        return read_table(spark, path)
    raise ValueError(
        f"unsupported file format {path!r}: use .csv, .json/.jsonl, or parquet"
    )

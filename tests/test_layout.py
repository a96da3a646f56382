"""Z-order layout: multi-column file pruning measured from real footers."""

import shutil

import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.plans.layout import (
    cluster_zorder,
    pruning_stats,
    zorder_column,
)

N = 40_000
N_FILES = 32


def _table(spark):
    """Two independent, roughly uniform columns (decorrelated via
    multiplicative hashing) — the case single-column sort cannot serve."""
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 100_000).alias("a"),
        (F.col("id") * 40503 % 100_000).alias("b"),
    )


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("layout")
    plain, zed = str(root / "plain"), str(root / "zorder")
    df = _table(spark)
    # unclustered baseline: hash-scattered files (the default lake layout)
    df.repartition(N_FILES).write.mode("overwrite").parquet(plain)
    cluster_zorder(df, ["a", "b"], zed, n_files=N_FILES)
    yield plain, zed
    shutil.rmtree(str(root), ignore_errors=True)


def test_zorder_preserves_content(spark, layouts):
    plain, zed = layouts
    fp = lambda d: spark.read.parquet(d).agg(  # noqa: E731
        F.bit_xor(F.xxhash64("id", "a", "b")).alias("x"),
        F.count("*").alias("n")).collect()[0]
    assert fp(plain) == fp(zed)


def test_zorder_prunes_both_columns(spark, layouts):
    plain, zed = layouts
    # a 2%-selectivity range on EACH column: the unclustered layout scans
    # ~every file; the z-ordered layout scans a small tile band
    for col in ("a", "b"):
        p = pruning_stats(plain, col, 40_000, 42_000)
        z = pruning_stats(zed, col, 40_000, 42_000)
        assert p["fraction"] >= 0.9, (col, p)
        assert z["fraction"] <= 0.5, (col, z)
        assert z["scanned"] < p["scanned"]


def test_zorder_query_results_identical(spark, layouts):
    plain, zed = layouts
    q = lambda d: (spark.read.parquet(d)  # noqa: E731
                   .filter("a between 40000 and 42000")
                   .agg(F.sum("id"), F.count("*")).collect())
    assert q(plain) == q(zed)


def test_zorder_rejects_string_columns(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("s"))
    with pytest.raises(ValueError, match="non-range-meaningful"):
        zorder_column(df, ["s"])


def test_zorder_constant_column_is_harmless(spark, tmp_path):
    out = str(tmp_path / "const")
    df = spark.range(1000).select(
        F.col("id"), F.lit(7).alias("c"),
        (F.col("id") * 2654435761 % 1000).alias("a"))
    cluster_zorder(df, ["c", "a"], out, n_files=8)
    st = pruning_stats(out, "a", 100, 120)
    assert st["files"] == 8 and st["fraction"] <= 0.5


def test_compact_files(spark, tmp_path):
    from semantic_log_detector_spark.plans.layout import compact_files

    src, out = str(tmp_path / "frag"), str(tmp_path / "compact")
    # a fragmented table: 64 tiny files
    _table(spark).repartition(64).write.mode("overwrite").parquet(src)
    st = compact_files(spark, src, out, target_mb=256)
    assert st["files_before"] == 64
    assert st["files_after"] < 8  # tiny table → one-ish target-sized file
    fp = lambda d: spark.read.parquet(d).agg(  # noqa: E731
        F.bit_xor(F.xxhash64("id", "a", "b")), F.count("*")).collect()
    assert fp(src) == fp(out)


def test_cli_optimize_and_sketch_rollup(spark, tmp_path, capsys):
    from semantic_log_detector_spark.cli import main
    from semantic_log_detector_spark.plans.sketch_state import (
        write_increment_sketches,
    )

    src = str(tmp_path / "clisrc")
    _table(spark).repartition(16).write.mode("overwrite").parquet(src)
    assert main(["optimize", "--input", src,
                 "--out", str(tmp_path / "cliout")]) == 0
    assert "compacted 16 files" in capsys.readouterr().out
    assert main(["optimize", "--input", src, "--zorder", "a,b",
                 "--out", str(tmp_path / "clized")]) == 0
    assert "z-ordered by [a,b]" in capsys.readouterr().out
    z = pruning_stats(str(tmp_path / "clized"), "a", 40_000, 42_000)
    assert z["files"] >= 1

    # sketch-rollup: clean pair of increments → exit 0; re-delivery → 1
    out = str(tmp_path / "skout")
    clips = lambda lo, hi: spark.range(lo, hi).selectExpr(  # noqa: E731
        "concat('id', id) clip_id", "'t' transcript",
        "cast(2000 as int) dur_ms", "cast(16000 as int) sr_hz")
    write_increment_sketches(spark, clips(0, 2000), out, "r1")
    write_increment_sketches(spark, clips(2000, 3000), out, "r2")
    assert main(["sketch-rollup", "--out", out]) == 0
    assert "dup_ratio" in capsys.readouterr().out
    write_increment_sketches(spark, clips(0, 2000), out, "r3")
    assert main(["sketch-rollup", "--out", out]) == 1
    assert "R090 DUPLICATE-FEED" in capsys.readouterr().out


def test_orc_dispatch_roundtrip(spark, tmp_path):
    from semantic_log_detector_spark.sources.files import read_file

    p = str(tmp_path / "t.orc")
    spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("k")) \
        .write.mode("overwrite").orc(p)
    got = read_file(spark, p)
    assert got.count() == 100
    assert got.agg(F.sum("k")).collect()[0][0] == \
        sum(i % 7 for i in range(100))


def test_zorder_accepts_date_and_timestamp_columns(spark, tmp_path):
    # Round-5 ADVICE: 'date' passed the type gate but DATE->DOUBLE cast
    # blew up at the min/max agg. Both temporal types must now cluster.
    from semantic_log_detector_spark.plans.layout import cluster_zorder

    df = spark.range(0, 2000).selectExpr(
        "id",
        "date_add(date'2024-01-01', cast(id % 365 as int)) as d",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as ts",
        "cast(id % 97 as double) as v",
    )
    out = str(tmp_path / "zd")
    cluster_zorder(df, ["d", "v"], out, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == 2000
    assert back.agg(F.min("d"), F.max("d")).collect()[0] is not None
    out2 = str(tmp_path / "zt")
    cluster_zorder(df, ["ts", "v"], out2, n_files=8)
    assert spark.read.parquet(out2).count() == 2000

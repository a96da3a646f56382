"""Python-native payload scan: xxhash64 parity, stats equality vs the
JVM-fed path, wave-resume filtering, and suite verdict equivalence."""

import pyspark.sql.functions as F
import pytest

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.drift import decode_stats
from semantic_log_detector_spark.functions.sparkhash import part_id, xxhash64
from semantic_log_detector_spark.sources.payload_scan import (
    list_row_groups,
    payload_stats_scan,
)

CTX16 = RunContext(run_id="t", num_parts=16)


def test_xxhash64_parity(spark):
    ids = ["clip_000001", "", "a", "ab", "abc", "abcd", "abcdefgh",
           "0123456789abcdef0123456789abcdefXYZ", "日本語テキスト",
           "x" * 31, "y" * 32, "z" * 33, "w" * 100]
    rows = (
        spark.createDataFrame([(s,) for s in ids], ["s"])
        .select("s", F.xxhash64("s").alias("h"),
                F.pmod(F.xxhash64("s"), F.lit(64)).alias("p"))
        .collect()
    )
    for r in rows:
        assert xxhash64(r["s"].encode("utf-8")) == r["h"], r["s"]
        assert part_id(r["s"], 64) == r["p"], r["s"]


@pytest.fixture(scope="module")
def clips_parquet(spark, clips_2k, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pscan") / "clips")
    clips_2k.write.mode("overwrite").parquet(path)
    return path


def _agg(df):
    """Canonical comparable form: merge partials (batch boundaries differ
    between the two readers), keep violations as-is."""
    hist = (
        df.filter("kind = 'h'")
        .groupBy("part_id", "feature", "bin").agg(F.sum("cnt").alias("cnt"))
    )
    counts = (
        df.filter("kind = 'c'").groupBy("part_id").agg(F.sum("cnt").alias("cnt"))
    )
    viols = df.filter("kind = 'v'").select(
        "part_id", "feature", "clip_id", "observed", "expected")
    return hist, counts, viols


def test_scan_matches_decode_stats(spark, clips_2k, clips_parquet):
    jvm = decode_stats(clips_2k, CTX16)
    py = payload_stats_scan(spark, clips_parquet, CTX16)
    for a, b in zip(_agg(jvm), _agg(py)):
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_scan_pending_parts_filter(spark, clips_2k, clips_parquet):
    pend = [0, 3, 7]
    py = payload_stats_scan(spark, clips_parquet, CTX16, pending_parts=pend)
    got = {r["part_id"] for r in py.select("part_id").distinct().collect()}
    assert got <= set(pend)
    # and the kept slice matches the JVM path filtered the same way
    jvm = decode_stats(clips_2k.filter(F.col("part_id").isin(pend)), CTX16)
    for a, b in zip(_agg(jvm), _agg(py)):
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_suite_verdicts_identical_with_payload_scan(spark, clips_2k, clips_parquet, tmp_path):
    from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite

    transcripts = clips_2k.select(F.col("clip_id"), F.col("transcript"))
    cfg = SuiteConfig(num_parts=16, checks=("drift",))
    outs = []
    for tag, path in (("general", None), ("pyscan", clips_parquet)):
        out = str(tmp_path / tag)
        run_suite(spark, spark.read.parquet(clips_parquet), transcripts, out,
                  cfg, input_fingerprint=tag, clips_path=path)
        outs.append(
            spark.read.parquet(f"{out}/verdicts")
            .select("part_id", "rule_id", "passed", "n_rows", "n_violations")
        )
    a, b = outs
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_list_row_groups(clips_parquet):
    groups = list_row_groups(clips_parquet)
    assert len(groups) >= 1
    assert all(g >= 0 and f.endswith(".parquet") for f, g in groups)


def test_list_row_groups_recursive_nested_layout(clips_parquet, tmp_path):
    """Hive-style key=value subdirectories must be walked, not ignored."""
    import shutil

    nested = tmp_path / "nested"
    (nested / "day=1").mkdir(parents=True)
    (nested / "day=2").mkdir(parents=True)
    files = [f for f, _ in list_row_groups(clips_parquet)]
    shutil.copy(files[0], nested / "day=1" / "part-0.parquet")
    shutil.copy(files[0], nested / "day=2" / "part-0.parquet")
    groups = list_row_groups(str(nested))
    assert len(groups) == 2 * len({g for f, g in list_row_groups(files[0])})
    assert {f.split("/")[-2] for f, _ in groups} == {"day=1", "day=2"}


def test_list_row_groups_distributed_listing(spark, clips_parquet, monkeypatch):
    import semantic_log_detector_spark.sources.payload_scan as ps

    serial = list_row_groups(clips_parquet)
    monkeypatch.setattr(ps, "_DISTRIBUTED_LISTING_THRESHOLD", 0)
    distributed = ps.list_row_groups(clips_parquet, spark)
    assert distributed == serial


def test_validate_payload_path_guards(clips_parquet, tmp_path):
    from semantic_log_detector_spark.sources.payload_scan import validate_payload_path

    # matching num_parts → usable
    assert validate_payload_path(clips_parquet, 16) is None
    # stored part_id was computed at P=16; asking for P=64 must refuse
    reason = validate_payload_path(clips_parquet, 64)
    assert reason is not None and "part_id" in reason
    # schema missing payload columns → refuse
    import pyarrow as pa
    import pyarrow.parquet as pq

    bad = tmp_path / "bad"
    bad.mkdir()
    pq.write_table(pa.table({"clip_id": ["a"]}), bad / "f.parquet")
    reason = validate_payload_path(str(bad), 16)
    assert reason is not None and "missing columns" in reason


def test_runner_falls_back_on_part_id_mismatch(spark, clips_2k, clips_parquet, tmp_path):
    """run_suite with num_parts=64 over a table materialized at P=16 must
    not silently use the payload scan (ADVICE r1): verdicts must match the
    general path's ensure_part_id semantics."""
    from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite

    cfg = SuiteConfig(num_parts=64, checks=("drift",))
    out = str(tmp_path / "fallback")
    run_suite(spark, spark.read.parquet(clips_parquet).drop("part_id"),
              None, out, cfg, input_fingerprint="fb", clips_path=clips_parquet)
    verdicts = spark.read.parquet(f"{out}/verdicts")
    # with the stored P=16 part_id rejected, part ids come from
    # ensure_part_id at P=64 → ids range over [0, 64)
    parts = {r["part_id"] for r in verdicts.select("part_id").distinct().collect()}
    assert max(parts) >= 16  # P=16 ids would all be < 16

"""Physical-plan audits — the properties that make queries survive 100 TB.

Correctness tests prove the small-SF answer; these prove the PLAN: filters
reach the parquet scan, projections prune columns (above all: metadata
checks must never read the audio `bytes` column), small dims broadcast,
expressions stay in whole-stage codegen, and nothing in the query catalog
degenerates into a cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_dim_join_is_broadcast(spark):
    import __spark_entry__ as em

    plan = plan_of(em.queries()["q02_nation_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filter_pushed_to_parquet_scan(spark):
    import __spark_entry__ as em

    plan = plan_of(em.queries()["q23_embedding_topk"](spark, SF_DIR))
    # the q_id < 10 predicate must reach the embeddings scan
    assert "PushedFilters" in plan
    assert "LessThan(vec_id,10)" in plan.replace(" ", "")


def test_column_pruning_reaches_scan(spark):
    import __spark_entry__ as em

    plan = plan_of(em.queries()["q04_freq_priority"](spark, SF_DIR))
    # only the grouped column is read; the wide order columns are pruned
    assert "o_orderpriority" in plan
    assert "o_totalprice" not in plan and "o_comment" not in plan


def test_metadata_checks_never_read_bytes(spark, tmp_path):
    """SURVEY §7.3: `bytes` dominates I/O; stats/uniqueness/frequency scans
    must prune it. Materialize a payload-bearing clip table and assert the
    stats-profile scan's ReadSchema excludes bytes AND transcript."""
    from semantic_log_detector_spark.checks.column_stats import profile
    from semantic_log_detector_spark.sources.synth import clips_table

    path = str(tmp_path / "clips")
    clips_table(spark, 200, with_bytes=True).write.parquet(path)
    df = spark.read.parquet(path)
    plan = plan_of(profile(df, ["sr_hz", "dur_ms"]))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, f"no scan in plan:\n{plan}"
    for ln in scan_lines:
        assert "bytes" not in ln and "transcript" not in ln, ln


def test_flagship_agg_is_whole_stage_codegen(spark):
    import __spark_entry__ as em

    # under AQE the pre-execution plan reports 0 codegen subtrees (they
    # compile per-stage at runtime); disable AQE for this one inspection —
    # whole-stage-codegen eligibility is a property of the operator chain,
    # not of adaptive re-planning
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(em.queries()["q01_pricing_summary"](spark, SF_DIR), mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen" in plan
    assert "Found 0 WholeStageCodegen" not in plan


@pytest.mark.parametrize("name", [
    "q01_pricing_summary", "q02_nation_revenue", "q03_topk_orders",
    "q07_set_ops", "q08_window_scalars", "q13_window_alerts",
    "q21_exact_dup_docs", "q22_ngram_jaccard", "q28_stats_profile",
    "q29_orders_without_lineitem", "q30_dim_lookup", "q31_semi_blocklist",
    "q32_topk_per_group", "q34_simhash_pairs", "q24_embedding_profile",
    "q42_stratified_split", "q44_decontamination",
])
def test_no_cartesian_product(spark, name):
    """No query in the catalog may degenerate into a cartesian product.
    (The deliberate broadcast-1-row crossJoins in q09/q18/q20/q27 compile
    to BroadcastNestedLoopJoin over a single-row side — those queries are
    audited separately below.)"""
    import __spark_entry__ as em

    plan = plan_of(em.queries()[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize("name", ["q09_event_scalars", "q18_threshold_metrics",
                                  "q20_percentile_filter", "q27_psi_split"])
def test_scalar_crossjoins_are_broadcast(spark, name):
    """The scalar-subquery crossJoins must broadcast the 1-row side —
    never a shuffled cartesian."""
    import __spark_entry__ as em

    plan = plan_of(em.queries()[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_referential_check_scan_prunes_payload(spark, tmp_path):
    from semantic_log_detector_spark.checks.base import RunContext
    from semantic_log_detector_spark.checks.referential import referential_check
    from semantic_log_detector_spark.sources.synth import clips_table, transcripts_table

    cpath, tpath = str(tmp_path / "c"), str(tmp_path / "t")
    clips_table(spark, 200, with_bytes=True).write.parquet(cpath)
    transcripts_table(spark, 200).write.parquet(tpath)
    clips = spark.read.parquet(cpath)
    transcripts = spark.read.parquet(tpath)
    res = referential_check(clips, transcripts, RunContext(run_id="plan-audit"))
    for ln in plan_of(res.verdicts).splitlines():
        if "ReadSchema" in ln:
            assert "bytes" not in ln, ln


def test_pq_search_base_never_shuffles(spark):
    """pq_topk: the coded base flows scan → mapInPandas with NO Exchange
    before it; the only shuffle is the tiny candidate window, and the
    rerank path broadcasts the candidate list against the raw table."""
    import numpy as np

    from semantic_log_detector_spark.operators.knn import (
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = np.random.default_rng(0).standard_normal((8, 16, 8))
    codes = pq_encode(emb, cb, id_col="vec_id")
    import re

    q = emb.limit(3).select(F.col("vec_id").alias("q_id"), "embedding")
    plan = plan_of(pq_topk(q, codes, cb, k=3, base_id="vec_id"))
    assert "MapInPandas" in plan
    # exactly ONE shuffle in the whole plan — the window rank over the
    # tiny candidate set; the base side reached the ADC kernel unshuffled
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

    rr = pq_topk(q, codes, cb, k=3, base_id="vec_id",
                 rerank=10, rerank_base=emb)
    rplan = plan_of(rr)
    assert "BroadcastHashJoin" in rplan and "CartesianProduct" not in rplan


def test_ivfpq_search_base_never_shuffles(spark):
    import numpy as np

    from semantic_log_detector_spark.operators.knn import (
        ivfpq_encode,
        ivfpq_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rng = np.random.default_rng(1)
    cents = rng.standard_normal((4, 64))
    books = rng.standard_normal((8, 16, 8))
    codes = ivfpq_encode(emb, cents, books, id_col="vec_id")
    import re

    q = emb.limit(3).select(F.col("vec_id").alias("q_id"), "embedding")
    plan = plan_of(ivfpq_topk(q, codes, cents, books, k=3, nprobe=2,
                              base_id="vec_id"))
    assert "MapInPandas" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1

"""kNN anomaly scoring + explanations (checks/anomaly.py) vs a numpy
replica of the reference math (anomaly_scorer.py:38-84,
explanation_engine.py:23-107) on a planted corpus, plus the check wrapper
and the LSH scale path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.checks.anomaly import (
    R_ANOMALY,
    anomaly_check,
    anomaly_explain,
    fit_baseline,
)
from semantic_log_detector_spark.checks.base import RunContext

DIM = 8
K = 3


@pytest.fixture(scope="module")
def planted(spark):
    """40 baseline vectors in a tight Gaussian blob + 4 scored vectors at
    increasing distance from it, with keyworded texts."""
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((40, DIM)) * 0.1
    scored_vecs = np.stack(
        [
            base[0] + 0.01,                     # inlier → low distance
            base[1] + 0.6,                      # moderate
            np.full(DIM, 3.0),                  # far → anomaly
            np.full(DIM, -5.0),                 # very far → score capped at 1.0
        ]
    )
    texts = [
        "all good",
        "connection timeout while polling",
        "fatal error: out of memory on cpu node",
        "login auth failure cascade",
    ]
    baseline = spark.createDataFrame(
        [(int(100 + i), [float(x) for x in row]) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    scored = spark.createDataFrame(
        [
            (int(i), [float(x) for x in row], texts[i])
            for i, row in enumerate(scored_vecs)
        ],
        "vec_id long, embedding array<double>, text string",
    )
    return base, scored_vecs, texts, baseline, scored


def _np_knn_means(queries, base, base_ids, k, exclude_same_index=False):
    """Per-query mean of the k nearest 6-dp-rounded L2 distances (the
    engine rounds per-pair distances before ranking, knn.py:58)."""
    out = []
    for qi, q in enumerate(queries):
        d = np.round(np.sqrt(((base - q) ** 2).sum(axis=1)), 6)
        order = np.lexsort((base_ids, d))
        if exclude_same_index:
            order = [j for j in order if j != qi]
        out.append(float(np.mean(d[order[:k]])))
    return np.array(out)


def test_matches_numpy_reference_math(spark, planted):
    base, scored_vecs, texts, baseline, scored = planted
    base_ids = np.arange(100, 140)
    bl_means = _np_knn_means(base, base, base_ids, K, exclude_same_index=True)
    threshold = float(np.percentile(bl_means, 95))
    base_mean, base_std = float(np.mean(bl_means)), float(np.std(bl_means))

    rows = {
        r["id"]: r
        for r in anomaly_explain(scored, baseline, k=K, text_col="text").collect()
    }
    sc_means = _np_knn_means(scored_vecs, base, base_ids, K)
    for i in range(4):
        exp_score = min(sc_means[i] / (2 * threshold), 1.0)
        exp_conf = min(abs(sc_means[i] - base_mean) / max(base_std, 0.01) / 3, 1.0)
        r = rows[i]
        assert r["mean_distance"] == pytest.approx(sc_means[i], abs=2e-6)
        assert r["anomaly_score"] == pytest.approx(exp_score, abs=2e-6)
        assert r["confidence"] == pytest.approx(exp_conf, abs=2e-6)
        assert r["is_anomaly"] == (sc_means[i] > threshold)
    # planted geometry: inlier low / capped far point at exactly 1.0
    assert not rows[0]["is_anomaly"]
    assert rows[2]["is_anomaly"] and rows[3]["is_anomaly"]
    assert rows[3]["anomaly_score"] == 1.0


def test_severity_buckets_and_summary(spark, planted):
    *_, baseline, scored = planted
    rows = {r["id"]: r for r in anomaly_explain(scored, baseline, k=K, text_col="text").collect()}
    assert rows[0]["severity"] == "Low"
    assert rows[0]["summary"].startswith("Low severity anomaly detected. This log shows minor")
    # score == 1.0 exactly falls through the bucket scan (engine :35-39)
    assert rows[3]["severity"] == "Critical"
    assert rows[3]["summary"].endswith("Extremely anomalous pattern detected.")
    for r in rows.values():
        if r["anomaly_score"] < 0.3:
            assert r["severity"] == "Low"
        elif r["anomaly_score"] < 0.6:
            assert r["severity"] == "Medium"
        elif r["anomaly_score"] < 0.8:
            assert r["severity"] == "High"
        else:
            assert r["severity"] == "Critical"


def test_recommendations_keyword_rules(spark, planted):
    *_, baseline, scored = planted
    rows = {r["id"]: r for r in anomaly_explain(scored, baseline, k=K, text_col="text").collect()}
    # tier base lists (explanation_engine.py:84-94)
    assert rows[0]["recommendations"].startswith("Continue monitoring")
    assert rows[3]["recommendations"].startswith("Investigate this log immediately|")
    # content rules (:96-107): timeout / error+memory+cpu / auth+login+fail
    assert "Review network connectivity" in rows[1]["recommendations"]
    assert "Check error handling" in rows[2]["recommendations"]
    assert "Monitor resource utilization trends" in rows[2]["recommendations"]
    assert "Review authentication logs" in rows[3]["recommendations"]
    assert "Check error handling" in rows[3]["recommendations"]  # 'failure'
    assert "Review network connectivity" not in rows[0]["recommendations"]


def test_top_neighbors_are_true_nearest(spark, planted):
    base, scored_vecs, _, baseline, scored = planted
    rows = {r["id"]: r for r in anomaly_explain(scored, baseline, k=K, text_col="text").collect()}
    d = np.round(np.sqrt(((base - scored_vecs[0]) ** 2).sum(axis=1)), 6)
    ids = np.arange(100, 140)
    order = np.lexsort((ids, d))
    expect = ";".join(str(ids[j]) for j in order[:3])
    assert rows[0]["top_neighbors"] == expect
    assert rows[0]["nn_distance"] == pytest.approx(d[order[0]], abs=1e-9)


def test_check_wrapper_violations_and_verdicts(spark, planted):
    *_, baseline, scored = planted
    ctx = RunContext("t_anom", num_parts=4)
    res = anomaly_check(scored, baseline, ctx, k=K, text_col="text")
    v = res.violations.collect()
    flagged = {r["clip_id"] for r in v}
    assert flagged == {"1", "2", "3"}  # the inlier stays clean
    for r in v:
        assert r["rule_id"] == R_ANOMALY
        assert "similar=[" in r["explanation"] and "recs: " in r["explanation"]
        assert r["observed"].startswith("score=")
    verd = res.verdicts.collect()
    assert {r["rule_id"] for r in verd} == {R_ANOMALY}
    assert sum(0 if r["passed"] else 1 for r in verd) >= 1


def test_lsh_scale_path_runs(spark, planted):
    *_, baseline, scored = planted
    out = anomaly_explain(
        scored, baseline, k=K, text_col="text", ann="lsh"
    )
    rows = out.collect()
    assert len(rows) == 4
    assert set(out.columns) == {
        "id", "mean_distance", "anomaly_score", "is_anomaly", "confidence",
        "severity", "summary", "top_neighbors", "nn_distance", "recommendations",
    }


def test_fit_baseline_single_row(spark, planted):
    *_, baseline, _ = planted
    row = fit_baseline(baseline, k=K).collect()
    assert len(row) == 1
    assert row[0]["threshold"] > 0
    assert row[0]["base_std"] >= 0


def test_scoring_plan_has_single_query_shuffle(spark, planted):
    """The groupBy(q_id) must ride the topk window's hash partitioning —
    exactly one Exchange keyed by the query id in the scoring subplan."""
    *_, baseline, scored = planted
    means_plan = (
        anomaly_explain(scored, baseline, k=K, text_col="text")
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
    )
    import re

    qid_exchanges = re.findall(r"Exchange hashpartitioning\(__qid", means_plan)
    assert len(qid_exchanges) <= 2  # one for scored means, one inside the fit
    assert "CartesianProduct" not in means_plan


def test_auto_ann_guard_switches_off_broadcast_brute(spark, planted):
    """Round-6 counted guard: with ann=None a baseline over the cap must
    resolve to the LSH path — no BroadcastNestedLoopJoin of the base
    vectors anywhere in the plan; below the cap the exact brute plan (and
    its broadcast nested-loop join) is kept."""
    *_, baseline, scored = planted

    def plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))

    import re

    def n_bnlj(df):
        # formatted plans print each operator in the tree AND the detail
        # list — count the "(n) BroadcastNestedLoopJoin" detail headers
        return len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan(df)))

    # the 1-row fit crossJoin is always one BroadcastNestedLoopJoin; the
    # brute kNN adds one per kNN pass (scored + baseline self-fit), so the
    # base side is broadcast iff the count exceeds 1
    brute = anomaly_explain(scored, baseline, k=K, text_col="text")
    assert n_bnlj(brute) > 1  # 40 rows < cap → brute

    auto_lsh = anomaly_explain(scored, baseline, k=K, text_col="text",
                               auto_brute_max_baseline=10)
    assert n_bnlj(auto_lsh) == 1

    # explicit override beats the guard in both directions
    forced = anomaly_explain(scored, baseline, k=K, text_col="text",
                             ann="brute", auto_brute_max_baseline=10)
    assert n_bnlj(forced) > 1

"""Robustness harness known-answers (reference src/ids/robustness.py:44-158).

The synth table plants drift in partitions (7, 21); the harness must show:
zero-noise runs are bit-stable, small noise neither flips verdicts nor
loses the planted detections, and flood-level noise degrades detection —
and the degradation is REPORTED, not hidden.
"""

import json
import os

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.plans.robustness import run_robustness
from semantic_log_detector_spark.sources.synth import clips_table


def test_robustness_grid_known_answers(spark, tmp_path):
    clips = clips_table(spark, 4000)
    ctx = RunContext(run_id="rob_test", num_parts=64)
    res = run_robustness(
        clips, ctx,
        noise_levels=(0.0, 0.01, 5.0),
        num_perturbations=1,
        out_dir=str(tmp_path),
    )
    by_level = {t["noise_level"]: t["summary"] for t in res["noise_tests"]}

    # planted drift parts are flagged in the clean baseline
    assert set(res["clean_baseline"]["flagged_partitions"]) >= {7, 21}

    # zero noise → identical verdicts (the deterministic-perturbation seam)
    assert by_level[0.0]["mean_stability"] == 1.0

    # 1% RMS noise → no verdict flips, planted detections retained
    assert by_level[0.01]["mean_stability"] >= 0.99
    assert by_level[0.01]["detection_retention"] == 1.0

    # 500% RMS noise floods the spectral signature → detection degrades,
    # and the report says so
    assert by_level[5.0]["detection_retention"] < 1.0

    # report persisted in the reference's shape
    path = os.path.join(str(tmp_path), "robustness_report.json")
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk["overall_robustness_score"] == res["overall_robustness_score"]
    assert on_disk["noise_tests"][0]["perturbation_runs"][0]["seed"] == 42

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

    # 1% RMS noise → planted detections retained, and only cells sitting
    # AT the PSI threshold may flip. The R066 fixture plants brick-wall
    # lowpassed clips (~6 in 4000), which legitimately push two
    # partitions' mfcc_0 PSI to the 0.2 margin (0.195/0.228 observed) —
    # threshold-straddling cells flip under any perturbation by
    # construction, so the bound is 2 cells of 128, not zero.
    assert by_level[0.01]["mean_stability"] >= 0.98
    assert by_level[0.01]["detection_retention"] >= 0.9
    runs_001 = next(
        t for t in res["noise_tests"] if t["noise_level"] == 0.01
    )["perturbation_runs"]
    assert all(
        {7, 21} <= set(r["flagged_partitions"]) for r in runs_001
    ), "planted drift partitions must stay detected at 1% noise"

    # 500% RMS noise floods the spectral signature → detection degrades,
    # and the report says so
    assert by_level[5.0]["detection_retention"] < 1.0

    # report persisted in the reference's shape
    path = os.path.join(str(tmp_path), "robustness_report.json")
    with open(path) as f:
        on_disk = json.load(f)
    assert on_disk["overall_robustness_score"] == res["overall_robustness_score"]
    assert on_disk["noise_tests"][0]["perturbation_runs"][0]["seed"] == 42

"""Direct test for the run report (reference report_generator.py:16-287
recast: dataset stats, rule tables, severity rollup, worst partitions,
examples, timings, robustness section, observations)."""

import json
import os

from semantic_log_detector_spark.plans.report import write_report
from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite
from semantic_log_detector_spark.sources.synth import clips_table, transcripts_table


def test_report_sections(spark, tmp_path):
    out = str(tmp_path / "run")
    clips = clips_table(spark, 3000)
    transcripts = transcripts_table(spark, 3000)
    run_suite(spark, clips, transcripts, out, SuiteConfig(),
              input_fingerprint="report_test")
    # drop a robustness report alongside to exercise its section
    rob = {
        "overall_robustness_score": 0.97,
        "noise_tests": [
            {"noise_level": 0.01,
             "summary": {"mean_stability": 1.0, "detection_retention": 1.0}}
        ],
    }
    with open(f"{out}/robustness_report.json", "w") as f:
        json.dump(rob, f)

    report = write_report(spark, out)

    # json shape
    assert report["dataset"]["n_rows_total"] == 3000
    assert report["dataset"]["n_parts"] == 64
    rule_ids = {r["rule_id"] for r in report["rules"]}
    assert {"R060_decode", "R050_drift_psi", "R062_codec_fidelity"} <= rule_ids
    assert report["severity"].get("Critical", 0) > 0  # planted truncated bytes
    assert len(report["worst_partitions"]) > 0
    assert any(e["clip_id"] for e in report["examples"])
    assert "drift" in report["timings_ms"]
    assert report["robustness"]["overall_robustness_score"] == 0.97

    # markdown rendering
    md = open(os.path.join(out, "report.md")).read()
    for section in ("## 1. Dataset", "## 2. Rule results",
                    "## 3. Violations by severity", "## 4. Worst partitions",
                    "## 5. Example violations", "## 6. Check timings",
                    "## 7. Robustness", "## Observations"):
        assert section in md, f"missing section {section!r}"
    assert "R050_drift_psi" in md

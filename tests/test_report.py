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
    # suite-level honesty margin: the synth corpus plants opus/mp3 rows
    # that route through the deterministic fake decoder — the corpus-wide
    # fake share must be ONE visible number
    assert report["dataset"]["n_fake_decoded"] > 0
    assert 0.0 < report["dataset"]["fake_fraction"] < 1.0

    # markdown rendering
    md = open(os.path.join(out, "report.md")).read()
    for section in ("## 1. Dataset", "## 2. Rule results",
                    "## 3. Violations by severity", "## 4. Worst partitions",
                    "## 5. Example violations", "## 6. Check timings",
                    "## 7. Robustness", "## Observations"):
        assert section in md, f"missing section {section!r}"
    assert "R050_drift_psi" in md
    assert "fake-decoded payloads" in md


def test_report_training_data_sections(spark, tmp_path):
    """Curation accounting, decontamination counts, and the dup-cluster
    summary render when the curate pass left its artifacts in out_dir."""
    from semantic_log_detector_spark.operators.curate import (
        curate_documents, curation_summary)

    out = str(tmp_path / "run2")
    clips = clips_table(spark, 1500)
    transcripts = transcripts_table(spark, 1500)
    run_suite(spark, clips, transcripts, out, SuiteConfig(),
              input_fingerprint="report_td_test")

    # tiny corpus with a planted 3-chain near-dup cluster + a junk doc
    base = "the quick brown fox jumps over the lazy dog and runs far away " * 8
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra tail words here"),
         (3, base + " extra tail words here now"),
         (10, "completely different text about spark shuffles and partitions "
              "written at length to pass the quality and token thresholds " * 6),
         (99, "zz")],  # fails quality
        ["doc_id", "text"],
    )
    arts, stats = {}, {"decontaminated_docs": 4}  # decontamination count as the CLI records it
    kept = curate_documents(docs, exact_pairs=True, jaccard_threshold=0.5,
                            min_quality=0.2, langs=(), drop_stats=stats,
                            artifacts=arts)
    kept.write.mode("overwrite").parquet(f"{out}/kept")
    arts["clusters"].write.mode("overwrite").parquet(f"{out}/dup_clusters")
    summary = curation_summary(spark.read.parquet(f"{out}/kept")).first().asDict()
    summary["drop_stats"] = {k: v for k, v in stats.items() if k != "persisted"}
    with open(f"{out}/curation_summary.json", "w") as f:
        json.dump(summary, f, default=str)

    report = write_report(spark, out)
    assert report["curation"]["n_docs"] == summary["n_docs"]
    assert report["curation"]["drop_stats"]["decontaminated_docs"] == 4
    dc = report["dup_clusters"]
    assert dc["n_clusters"] == 1
    assert dc["n_docs_in_clusters"] == 3      # the planted 1-2-3 chain
    assert dc["n_docs_removed"] == 2          # one canonical kept
    assert dc["largest"][0]["size"] == 3

    md = open(os.path.join(out, "report.md")).read()
    assert "## 8. Training-data curation" in md
    assert "## 9. Duplicate clusters" in md
    assert "removed for benchmark overlap" in md
    assert "one canonical kept per cluster" in md


def test_report_streaming_audio_dedup_section(spark, tmp_path):
    """Round-3 verdict #9: when the batch pair table and the online twin's
    window matches are both in out_dir, the report quantifies the online
    path's deferral — Hamming>0 pairs and cross-window pairs are batch-only
    by contract, and operators should see those counts, not a docstring."""
    from semantic_log_detector_spark.sources.synth import (
        clips_table, transcripts_table)

    out = str(tmp_path / "run3")
    run_suite(spark, clips_table(spark, 800), transcripts_table(spark, 800),
              out, SuiteConfig(), input_fingerprint="report_sad_test")

    # batch authority found 5 pairs: 3 at hamming 0, 2 at hamming 1-3
    spark.createDataFrame(
        [("a", "b", 0), ("c", "d", 0), ("e", "f", 0),
         ("g", "h", 2), ("i", "j", 3)],
        "id_a string, id_b string, hamming int",
    ).write.mode("overwrite").parquet(f"{out}/audio_dups_batch")
    # online twin caught 2 of the hamming-0 pairs in-window; the third
    # straddled a window boundary
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    spark.createDataFrame(
        [(t0, t0, 11, 2, ["a", "b"]), (t0, t0, 22, 2, ["c", "d"])],
        "window_start timestamp, window_end timestamp, fp long,"
        " n_clips long, clip_ids array<string>",
    ).write.mode("overwrite").parquet(f"{out}/audio_dups_online")

    report = write_report(spark, out)
    sad = report["streaming_audio_dedup"]
    assert sad["batch_pairs"] == 5
    assert sad["online_pairs"] == 2
    assert sad["deferred_pairs"] == 3
    assert sad["deferred_hamming_gt0"] == 2
    assert sad["deferred_cross_window"] == 1

    md = open(os.path.join(out, "report.md")).read()
    assert "## 10. Streaming acoustic dedup coverage" in md
    assert "deferred to the batch authority" in md

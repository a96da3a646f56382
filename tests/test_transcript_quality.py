"""Transcript-quality check: known-answer violations + suite integration."""

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.transcript_quality import (
    R_LANG,
    R_QUALITY,
    R_TOKENS,
    transcript_quality_check,
)


def test_planted_violations(spark):
    rows = [
        ("c1", "the quick spark clip audio data table check valid"),  # clean en
        ("c2", "der hund ist nicht auf der wiese und das ist ein problem"),  # de
        ("c3", "!!!!!!!!!!!!!!!!! ################# $$$$$$$$$$$$$$$$$"),  # junk → low quality
        ("c4", None),  # null → not this check's business
        ("c5", "word"),  # 1 token, inside range
    ]
    df = spark.createDataFrame(rows, ["clip_id", "transcript"])
    ctx = RunContext(run_id="tq", num_parts=8)
    res = transcript_quality_check(
        df, ctx, allowed_langs=("en", "und"), min_quality=0.6, token_range=(1, 100)
    )
    v = {(r["rule_id"], r["clip_id"]) for r in res.violations.collect()}
    assert (R_LANG, "c2") in v          # german outside allowed set
    assert (R_QUALITY, "c3") in v       # junk scores 0.5 (<0.6): bad token len, no letters
    assert not any(c == "c4" for _, c in v)  # nulls skipped
    assert not any(c == "c1" for _, c in v)
    # verdict grid covers every (part, rule) with explicit pass/fail
    verd = res.verdicts.collect()
    assert {r["rule_id"] for r in verd} == {R_LANG, R_QUALITY, R_TOKENS}
    assert any(not r["passed"] for r in verd)


def test_suite_includes_transcript_quality(spark, tmp_path):
    from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite
    from semantic_log_detector_spark.sources.synth import clips_table

    clips = clips_table(spark, 1000, num_parts=16, with_bytes=False)
    out = str(tmp_path / "tq_suite")
    r = run_suite(spark, clips, None, out,
                  SuiteConfig(num_parts=16, checks=("transcript_quality",)),
                  input_fingerprint="tq")
    assert "transcript_quality" in r.checks_run
    verd = spark.read.parquet(f"{out}/verdicts")
    assert verd.filter(f"rule_id = '{R_LANG}'").count() == 16
    # synthetic transcripts are clean under the default thresholds
    assert verd.filter("NOT passed").count() == 0

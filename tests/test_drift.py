"""Drift check: flags exactly the planted drifted partitions; decode errors
become violations; per-partition verdicts stable across parallelism."""

import pyspark.sql.functions as F

from semantic_log_detector_spark.checks.base import RunContext
from semantic_log_detector_spark.checks.drift import (
    decode_features,
    drift_check,
    histogram_partials,
)

CTX16 = RunContext(run_id="t", num_parts=16)

import pytest  # noqa: E402


@pytest.fixture(scope="module")
def drift_res(clips_2k):
    return drift_check(clips_2k, CTX16)


def test_drift_flags_exactly_planted_parts(drift_res):
    res = drift_res
    failed = {
        (r["rule_id"], r["part_id"])
        for r in res.verdicts.filter("NOT passed AND rule_id LIKE 'R05%'").collect()
    }
    drift_parts = {p for _, p in failed}
    assert drift_parts == {7}
    assert ("R050_drift_psi", 7) in failed


def test_decode_errors_are_violations_not_failures(drift_res):
    res = drift_res
    n_decode = res.violations.filter("rule_id = 'R060_decode'").count()
    assert n_decode >= 1  # planted truncated payloads
    # every decode violation names its clip
    assert res.violations.filter("rule_id='R060_decode' AND clip_id IS NULL").count() == 0


def test_histograms_partition_invariant(clips_2k):
    feats = decode_features(clips_2k, CTX16)
    h1 = histogram_partials(feats, CTX16)
    feats2 = decode_features(clips_2k.repartition(3), CTX16)
    h2 = histogram_partials(feats2, CTX16)
    assert h1.exceptAll(h2).count() == 0 and h2.exceptAll(h1).count() == 0


def test_local_and_spark_scores_agree(clips_2k):
    from semantic_log_detector_spark.checks.drift import drift_scores, drift_scores_local

    feats = decode_features(clips_2k, CTX16)
    hist = histogram_partials(feats, CTX16).cache()
    spark_side = {
        (r["part_id"], r["feature"]): (r["psi"], r["ks"])
        for r in drift_scores(hist, CTX16).collect()
    }
    local_side = {
        (p, f): (psi, ks)
        for p, f, psi, ks in drift_scores_local([tuple(r) for r in hist.collect()], CTX16)
    }
    hist.unpersist()
    assert set(spark_side) == set(local_side)
    for k, (psi, ks) in spark_side.items():
        lp, lk = local_side[k]
        assert abs(psi - lp) < 1e-9 and abs(ks - lk) < 1e-9


def test_normal_parts_psi_low(drift_res):
    res = drift_res
    psis = res.verdicts.filter("rule_id='R050_drift_psi' AND part_id != 7").select(
        F.regexp_extract("observed", r"max_psi=([0-9.]+)", 1).cast("double").alias("psi")
    ).collect()
    assert all(r["psi"] is not None and r["psi"] < 0.2 for r in psis)


def test_payload_quality_rules_flag_exactly_planted(spark):
    """R063/R064/R065 fire on exactly the planted clipped / silent /
    DC-biased clips (every codec family included) and never on clean ones
    — computed inside the same single decode pass (no extra payload read)."""
    import numpy as np

    from semantic_log_detector_spark.checks.drift import decode_stats
    from semantic_log_detector_spark.sources.synth import (
        DEFECT_RATES, _u01, clips_table)

    n = 20000
    i = np.arange(n)
    planted = {
        "R063_clipping": int((_u01(i, 25, 42) < DEFECT_RATES["audio_clipped"]).sum()),
        "R064_silence": int((_u01(i, 26, 42) < DEFECT_RATES["audio_silent"]).sum()),
        "R065_dc_offset": int((_u01(i, 27, 42) < DEFECT_RATES["audio_dc"]).sum()),
    }
    assert all(v > 0 for v in planted.values())  # the test plants something
    stats = decode_stats(clips_table(spark, n, with_bytes=True), CTX16)
    got = {
        r["feature"]: r["n"]
        for r in stats.filter(F.col("kind") == "v")
        .groupBy("feature").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["feature"] in planted
    }
    # exact: every planted defect detected THROUGH its codec roundtrip
    # (mulaw/alaw/adpcm included), zero false positives on clean clips
    assert got == planted


def test_bandwidth_rule_flags_exactly_planted_upsamples(spark):
    """R066 fires on exactly the planted half-rate (upsampled) clips whose
    codec roundtrip preserves the band-limit evidence — PCM/FLAC/G.711 —
    and NEVER on clean full-band clips. ADPCM-planted upsamples are
    exempt by design (its quantization floor ≈ −24 dB refills the high
    band; see HF_EXEMPT_CODECS), and fake-decoded opus/mp3 never carry
    the planted spectrum."""
    import numpy as np

    from semantic_log_detector_spark.checks.drift import decode_stats
    from semantic_log_detector_spark.sources.synth import (
        _CODEC_WEIGHTS, _CODECS, _u01, _weighted_pick, DEFECT_RATES,
        clips_table)

    n = 20000
    i = np.arange(n)
    u_ups = _u01(i, 28, 42) < DEFECT_RATES["audio_upsampled"]
    # the planting is the LAST elif of the defect chain — rows that drew an
    # earlier payload defect are not band-limited
    prior = (
        (_u01(i, 25, 42) < DEFECT_RATES["audio_clipped"])
        | (_u01(i, 26, 42) < DEFECT_RATES["audio_silent"])
        | (_u01(i, 27, 42) < DEFECT_RATES["audio_dc"])
    )
    codec = _weighted_pick(_u01(i, 10, 42), _CODECS, _CODEC_WEIGHTS).astype(object)
    codec[_u01(i, 11, 42) < DEFECT_RATES["codec_unknown"]] = "vorbis??"
    truncated = _u01(i, 22, 42) < DEFECT_RATES["bytes_truncated"]
    detectable = np.isin(codec.astype(str), ["pcm_s16le", "flac", "mulaw", "alaw"])
    expected = int((u_ups & ~prior & detectable & ~truncated).sum())
    assert expected > 0  # the fixture plants detectable upsamples

    stats = decode_stats(clips_table(spark, n, with_bytes=True), CTX16)
    got = (
        stats.filter((F.col("kind") == "v") & (F.col("feature") == "R066_bandwidth"))
        .count()
    )
    assert got == expected


def test_payload_quality_verdicts_in_suite(spark):
    """The quality rules surface as per-partition verdict rows of the
    drift check (pass/fail + violation rows), like R060/R061."""
    from semantic_log_detector_spark.sources.synth import clips_table

    res = drift_check(clips_table(spark, 4000, with_bytes=True), CTX16)
    rules = {r["rule_id"] for r in res.verdicts.select("rule_id").distinct().collect()}
    assert {"R063_clipping", "R064_silence", "R065_dc_offset"} <= rules
    viols = res.violations.filter(F.col("rule_id") == "R063_clipping").collect()
    assert viols and all(v["column"] == "bytes" and v["severity"] == "Medium"
                         and v["clip_id"] for v in viols)

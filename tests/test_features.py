"""Feature export + CMVN: values match the numpy kernel bit-for-bit
(float32 cast aside), partials are consistent, CMVN normalizes to
mean 0 / std 1, and the normalize pass stays JVM-side."""

import numpy as np
import pytest

from semantic_log_detector_spark.functions.audio import encode_wav, mfcc
from semantic_log_detector_spark.operators.features import (
    apply_cmvn,
    cmvn_stats,
    extract_features,
)


def _clip(seed, sr=16000, dur_s=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur_s)) / sr
    return (0.3 * np.sin(2 * np.pi * (200 + 50 * seed) * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def feats(spark):
    rows = [(f"c{i}", encode_wav(_clip(i), 16000), "pcm_s16le")
            for i in range(8)]
    rows.append(("junk", b"\x00" * 32, "pcm_s16le"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    return extract_features(df).persist()


def test_values_match_numpy_kernel(feats):
    got = {r["clip_id"]: r for r in feats.collect()}
    assert not got["junk"]["ok"] and got["junk"]["feats"] is None
    for i in (0, 5):
        r = got[f"c{i}"]
        assert r["ok"] and r["sr_hz"] == 16000
        from semantic_log_detector_spark.functions.audio import decode_clip
        pcm, sr = decode_clip(encode_wav(_clip(i), 16000), "pcm_s16le")
        exp = mfcc(np.asarray(pcm, np.float64), sr)
        assert r["n_frames"] == exp.shape[0]
        np.testing.assert_allclose(
            np.array(r["feats"]), exp.astype(np.float32), rtol=1e-6)
        # partials consistent with the frames they summarize
        np.testing.assert_allclose(np.array(r["f_sum"]), exp.sum(axis=0),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.array(r["f_sumsq"]),
                                   (exp * exp).sum(axis=0), rtol=1e-9)


def test_cmvn_stats_and_apply(feats):
    stats = cmvn_stats(feats)
    srows = stats.collect()
    assert len(srows) == 13
    total_frames = sum(r["n_frames"] for r in feats.filter("ok").collect())
    assert all(r["n_frames"] == total_frames for r in srows)

    normed = apply_cmvn(feats, stats)
    # recompute stats over the normalized frames: mean ≈ 0, std ≈ 1
    arr = np.concatenate([
        np.array(r["feats_cmvn"]) for r in normed.filter("ok").collect()
    ])
    np.testing.assert_allclose(arr.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(arr.std(axis=0), 1.0, atol=1e-3)
    # undecodable rows keep a null normalized column
    junk = normed.filter("clip_id = 'junk'").collect()[0]
    assert junk["feats_cmvn"] is None


def test_apply_cmvn_is_jvm_side(feats):
    """No Python UDF in the normalize pass — transform/zip_with only."""
    plan = apply_cmvn(feats, cmvn_stats(feats))._jdf.queryExecution() \
        .executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan


def test_logmel_kind_and_rejects(spark, feats):
    df = spark.createDataFrame(
        [("a", encode_wav(_clip(1), 16000), "pcm_s16le")],
        "clip_id string, bytes binary, codec string")
    lm = extract_features(df, kind="logmel", n_mels=20).collect()[0]
    assert lm["ok"] and len(lm["feats"][0]) == 20
    with pytest.raises(ValueError):
        extract_features(df, kind="spectro")

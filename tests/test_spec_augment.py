"""SpecAugment masking: deterministic, bounded, zero-only edits."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.operators.features import spec_augment

N_FRAMES, N_COEFF = 60, 13


@pytest.fixture(scope="module")
def tensors(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(12):
        x = rng.standard_normal((N_FRAMES, N_COEFF)).astype(np.float32)
        x += 5.0  # keep every true cell nonzero so masks are identifiable
        rows.append((f"c{i:02d}", True, [fr.tolist() for fr in x]))
    rows.append(("dead", False, None))
    df = spark.createDataFrame(
        rows, "clip_id string, ok boolean, feats array<array<float>>"
    ).cache()
    df.count()
    yield df
    df.unpersist()


def _mat(rows, cid):
    t = next(r["feats_sa"] for r in rows if r["clip_id"] == cid)
    return None if t is None else np.asarray(t)


def test_masks_are_bounded_zero_edits(tensors):
    got = spec_augment(tensors, seed=1).collect()
    orig = {r["clip_id"]: np.asarray(r["feats"]) for r in tensors.collect()
            if r["feats"] is not None}
    for cid, x0 in orig.items():
        x1 = _mat(got, cid)
        changed = x1 != x0
        # every edited cell is zero, and something was masked
        assert (x1[changed] == 0.0).all() and changed.any()
        # unmasked cells bit-identical
        assert np.array_equal(x1[~changed], x0[~changed])
        # time-mask budget: rows fully zeroed ≤ n_time_masks × max width
        zero_rows = (x1 == 0.0).all(axis=1).sum()
        assert zero_rows <= 2 * max(int(0.1 * N_FRAMES), 1)
        # freq-mask budget: columns fully zeroed ≤ n_freq_masks × max width
        zero_cols = (x1 == 0.0).all(axis=0).sum()
        assert zero_cols <= 2 * 4


def test_deterministic_and_partitioning_invariant(tensors):
    a = spec_augment(tensors, seed=9).collect()
    b = spec_augment(tensors.repartition(5), seed=9).collect()
    for cid in [r["clip_id"] for r in a if r["feats"] is not None]:
        assert np.array_equal(_mat(a, cid), _mat(b, cid))
    # a different seed produces different masks somewhere
    c = spec_augment(tensors, seed=10).collect()
    assert any(
        not np.array_equal(_mat(a, r["clip_id"]), _mat(c, r["clip_id"]))
        for r in a if r["feats"] is not None)


def test_null_tensor_passes_through(tensors):
    got = spec_augment(tensors).filter(~F.col("ok")).collect()
    assert len(got) == 1 and got[0]["feats_sa"] is None


def test_audio_embedding_retrieves_cross_codec_twin(spark):
    """audio_embedding (mean++std MFCC from the feature-pass partials)
    composed with brute_force_topk: each clip's nearest neighbour is its
    same-content re-encode through a DIFFERENT codec, across 8 distinct
    melodies. Also pins the JVM-side partial math against numpy."""
    import numpy as np

    from semantic_log_detector_spark.functions.adpcm import encode_adpcm
    from semantic_log_detector_spark.functions.audio import encode_wav, mfcc
    from semantic_log_detector_spark.functions.flac import encode_flac
    from semantic_log_detector_spark.operators.features import (
        audio_embedding,
        extract_features,
    )
    from semantic_log_detector_spark.operators.knn import brute_force_topk

    sr = 16000
    rng = np.random.default_rng(4)
    rows = []
    pcms = {}
    for mel in range(8):
        # well-separated spectra: distinct fundamental + inharmonic stack
        f0 = 220.0 + 55.0 * mel
        freqs = f0 * np.array([1.0, 1.93, 2.71, 3.77])
        t = np.arange(2 * sr) / sr
        pcm = sum(0.15 * np.sin(2 * np.pi * f * t) for f in freqs)
        pcm = (pcm + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        pcms[mel] = pcm
        for codec, enc in (("pcm_s16le", encode_wav),
                           ("flac", encode_flac),
                           ("adpcm_ima", encode_adpcm)):
            rows.append((f"m{mel}_{codec}", enc(pcm, sr), codec, sr, None))
    clips = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int, dur_ms int")
    feats = extract_features(clips)
    emb = audio_embedding(feats).cache()

    # partial-math check: one clip's embedding equals the numpy kernel
    # (reference decodes the WAV so int16 quantization matches the engine)
    from semantic_log_detector_spark.functions.audio import decode_wav

    got = {r["clip_id"]: np.asarray(r["embedding"]) for r in emb.collect()}
    dec, _ = decode_wav(encode_wav(pcms[0], sr))
    m = mfcc(np.asarray(dec, np.float64), sr)
    want = np.concatenate([m.mean(axis=0),
                           np.sqrt(m.var(axis=0) + 1e-8)])
    assert np.allclose(got["m0_pcm_s16le"], want, atol=1e-6)

    q = emb.select(F.col("clip_id").alias("q_id"), "embedding")
    top1 = brute_force_topk(q, emb, k=1, base_id="clip_id").collect()
    emb.unpersist()
    assert len(top1) == 24
    for r in top1:
        # nearest neighbour shares the melody, different codec
        assert r["q_id"].split("_")[0] == r["clip_id"].split("_")[0]
        assert r["q_id"] != r["clip_id"]

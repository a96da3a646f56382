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

"""Operator-level invariant for the round-5 full FLAC decoder: the same
signal encoded VERBATIM (byte-aligned fast path) and with
``compression="fixed"`` (bit-packed FIXED+Rice, all stereo assignments)
decodes to bit-identical PCM, so every payload operator must emit
bit-identical outputs for the two layouts — fingerprints, pitch, VAD
segments, and the decode/drift feature pass. Mirrors test_stereo.py's
mono/stereo twin protocol with layout ∈ {verbatim, packed}."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def twins(spark):
    from semantic_log_detector_spark.sources.synth import packed_flac_twin_clips

    return packed_flac_twin_clips(spark, 24, seed=7).cache()


def test_twin_fixture_shape(twins):
    rows = twins.collect()
    assert len(rows) == 48
    assert {r["layout"] for r in rows} == {"verbatim", "packed"}
    # the packed side is genuinely compressed on tonal/speech-like content
    by_pair = {}
    for r in rows:
        by_pair.setdefault(r["pair_id"], {})[r["layout"]] = len(r["bytes"])
    smaller = sum(v["packed"] < v["verbatim"] for v in by_pair.values())
    assert smaller >= len(by_pair) * 2 // 3


def _pairs_equal(df, twins, value_cols, key_cols=("pair_id",)):
    out = df.join(
        twins.select("clip_id", "pair_id", "layout"), "clip_id"
    ).toPandas()

    def canon(v):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        return v

    piv = {}
    for _, row in out.iterrows():
        k = tuple(row[c] for c in key_cols) + tuple(
            row[c] for c in value_cols if c in ("seg_idx",))
        piv.setdefault(k, {})[row["layout"]] = tuple(
            canon(row[c]) for c in value_cols)
    assert piv, "operator produced no rows"
    for k, v in piv.items():
        assert set(v) == {"verbatim", "packed"}, (k, v)
        assert v["verbatim"] == v["packed"], (k, v)


def test_packed_twins_identical_fingerprints(twins):
    from semantic_log_detector_spark.operators.audio_dedup import (
        audio_fingerprint,
    )

    _pairs_equal(
        audio_fingerprint(twins).withColumnRenamed("id", "clip_id"),
        twins, ["fp", "fake"],
    )


def test_packed_twins_identical_pitch(twins):
    from semantic_log_detector_spark.operators.features import pitch_features

    _pairs_equal(
        pitch_features(twins), twins,
        ["ok", "median_f0_hz", "f0_spread_hz", "voiced_ratio"],
    )


def test_packed_twins_identical_segments(twins):
    from semantic_log_detector_spark.operators.segment import speech_segments

    _pairs_equal(
        speech_segments(twins), twins,
        ["seg_idx", "start_s", "end_s", "dur_s", "rms_db", "fake"],
    )

"""Dataset card: counts reconcile exactly against the planted corpus, the
percentile tables are populated, duplication reflects planted dups, and
both artifacts render/write."""

import json
import os

import numpy as np

from semantic_log_detector_spark.functions.audio import encode_wav
from semantic_log_detector_spark.functions.g711 import encode_mulaw
from semantic_log_detector_spark.operators.dedup import unpersist_all
from semantic_log_detector_spark.plans.datacard import (
    build_datacard,
    render_datacard_md,
    write_datacard,
)


def _speechy(sr, seed, amp=0.25, seconds=2.0):
    """Burst-modulated random MELODY: distinct random tone sequence per
    seed so fingerprints never collide across clips (nearby single tones
    land in the same mel band and read as acoustic dups — correctly)."""
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(float)
    freqs = rng.choice(np.geomspace(220.0, 3600.0, 24), size=8, replace=False)
    seg = n // len(freqs)
    sig = np.zeros(n)
    for k, f in enumerate(freqs):
        sl = slice(k * seg, (k + 1) * seg if k < len(freqs) - 1 else n)
        sig[sl] = np.sin(2 * np.pi * f * t[sl])
    return (amp * env * (sig + 0.1 * rng.standard_normal(n))).astype(np.float32)


def _corpus(spark):
    sr = 16000
    rows = []
    for i in range(10):
        rows.append((f"wav{i}", encode_wav(_speechy(sr, i), sr), "pcm_s16le"))
    # one planted acoustic dup pair: same content re-encoded mulaw@8k
    from semantic_log_detector_spark.functions.audio import resample_linear

    rows.append(("dup0", encode_mulaw(
        resample_linear(_speechy(sr, 0), sr, 8000), 8000), "mulaw"))
    # fake decode: WAV-framed payload labeled opus (the synth convention;
    # real OggS magic would be honestly REFUSED, landing in undecodable)
    rows.append(("fake0", encode_wav(_speechy(sr, 99), sr), "opus"))
    rows.append(("junk0", b"\x01\x02", "pcm_s16le"))          # undecodable
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string")


def test_datacard_counts_and_dups(spark, tmp_path):
    df = _corpus(spark)
    stats = {}
    card = build_datacard(df, drop_stats=stats)

    c = card["counts"]
    assert c["total_clips"] == 13
    assert c["undecodable"] == 1
    assert c["fake_decoded"] == 1
    assert c["decodable"] == 12  # includes the fake-decoded row
    assert card["codecs"]["pcm_s16le"] == 11

    assert card["hours"]["audio"] > 0
    assert card["duration_s"]["p50"] == 2.0
    assert card["loudness_lufs"]["p50"] is not None

    d = card["acoustic_duplication"]
    assert d["dup_pairs"] == 1 and d["clips_in_dup_pairs"] == 2
    unpersist_all(stats)


def test_datacard_writes_artifacts(spark, tmp_path):
    df = _corpus(spark)
    out = str(tmp_path / "card")
    card = write_datacard(df, out)
    with open(os.path.join(out, "datacard.json")) as f:
        on_disk = json.load(f)
    assert on_disk == card
    md = open(os.path.join(out, "datacard.md")).read()
    assert "# Dataset card" in md and "Acoustic duplication" in md
    assert "pcm_s16le" in md
    # markdown renders the same numbers the json carries
    assert f"{card['counts']['total_clips']:,}" in md


def test_datacard_pitch_opt_in(spark):
    # corpus with one flat tone among speechy (wandering-pitch) clips
    sr = 16000
    t = np.arange(2 * sr) / sr
    tone = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    rows = [(f"wav{i}", encode_wav(_speechy(sr, i), sr), "pcm_s16le")
            for i in range(4)]
    rows.append(("tone0", encode_wav(tone, sr), "pcm_s16le"))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")

    stats = {}
    card = build_datacard(df, drop_stats=stats)
    assert "median_f0_hz" not in card and "flat_pitch" not in card  # opt-in
    unpersist_all(stats)

    stats2 = {}
    card = build_datacard(df, with_pitch=True, drop_stats=stats2)
    assert card["flat_pitch"]["n_clips"] == 1  # exactly the planted tone
    assert card["median_f0_hz"]["p50"] is not None
    md = render_datacard_md(card)
    assert "Flat-pitch contamination" in md and "Median F0" in md
    unpersist_all(stats2)

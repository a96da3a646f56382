"""Speech segmentation (energy VAD) against a planted burst schedule."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.functions.audio import encode_wav
from semantic_log_detector_spark.operators.segment import (
    _frame_rms_db,
    _segments_from_mask,
    speech_ratio,
    speech_segments,
)
from semantic_log_detector_spark.sources.synth import burst_clips

TOL_S = 0.035  # one hop + half a frame of boundary slack


def test_segments_match_planted_bursts(spark):
    clips = burst_clips(spark, 120, seed=5).cache()
    segs = speech_segments(clips).toPandas()
    truth = clips.select("clip_id", F.explode("bursts").alias("b")).select(
        "clip_id", "b.start_s", "b.end_s"
    ).toPandas()

    got = {
        cid: sorted(zip(g["start_s"], g["end_s"]))
        for cid, g in segs.groupby("clip_id")
    }
    want = {
        cid: sorted(zip(g["start_s"], g["end_s"]))
        for cid, g in truth.groupby("clip_id")
    }
    assert set(got) == set(want)  # every clip found, none extra
    for cid, planted in want.items():
        found = got[cid]
        assert len(found) == len(planted), (cid, found, planted)
        for (fs, fe), (ps, pe) in zip(found, planted):
            assert abs(fs - ps) <= TOL_S, (cid, fs, ps)
            assert abs(fe - pe) <= TOL_S, (cid, fe, pe)
    clips.unpersist()


def test_silent_and_undecodable_clips_emit_no_rows(spark):
    rows = [
        ("sil", encode_wav(np.zeros(16000, dtype=np.float32), 16000), "pcm_s16le"),
        ("bad", b"\x00" * 64, "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    assert speech_segments(df).count() == 0


def test_speech_ratio_covers_every_clip(spark):
    clips = burst_clips(spark, 60, seed=9)
    sil = spark.createDataFrame(
        [("allsilent", "pcm_s16le", 16000, 1000,
          encode_wav(np.zeros(16000, dtype=np.float32), 16000))],
        "clip_id string, codec string, sr_hz int, dur_ms int, bytes binary",
    )
    corpus = clips.select("clip_id", "codec", "sr_hz", "dur_ms", "bytes").unionByName(sil)
    segs = speech_segments(corpus)
    ratio = speech_ratio(corpus, segs).toPandas().set_index("clip_id")
    assert len(ratio) == 61
    assert ratio.loc["allsilent", "speech_ratio"] == 0.0
    assert ratio.loc["allsilent", "n_segments"] == 0
    # planted bursts are 0.4-0.5 s each out of 3 s
    burst = ratio.drop(index="allsilent")
    assert (burst["speech_ratio"] > 0.1).all()
    assert (burst["speech_ratio"] < 0.6).all()
    # ratio reconstructs from the segments exactly
    n_from_segs = segs.groupBy("clip_id").count().toPandas().set_index("clip_id")
    for cid, row in n_from_segs.iterrows():
        assert ratio.loc[cid, "n_segments"] == row["count"]


def test_mask_merge_kernel():
    hop_s, frame_s = 0.01, 0.02
    # two runs separated by a 5-frame (50 ms) gap < min_gap → bridged
    mask = np.array([0] * 10 + [1] * 30 + [0] * 5 + [1] * 30 + [0] * 10, bool)
    segs = _segments_from_mask(mask, hop_s, frame_s, 0.1, 0.15)
    assert len(segs) == 1
    # same runs separated by 20 frames (200 ms) > min_gap → two segments
    mask = np.array([0] * 10 + [1] * 30 + [0] * 20 + [1] * 30 + [0] * 10, bool)
    segs = _segments_from_mask(mask, hop_s, frame_s, 0.1, 0.15)
    assert len(segs) == 2
    # a 5-frame blip (~60 ms) < min_speech → dropped
    mask = np.array([0] * 10 + [1] * 5 + [0] * 50, bool)
    assert _segments_from_mask(mask, hop_s, frame_s, 0.1, 0.15) == []
    assert _segments_from_mask(np.zeros(10, bool), hop_s, frame_s, 0.1, 0.15) == []


def test_frame_rms_db_levels():
    sr = 16000
    pcm = np.concatenate([
        np.zeros(sr // 2),
        0.5 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / sr),
    ])
    db = _frame_rms_db(pcm, sr, 20.0, 10.0)
    # silence frames at the floor, tone frames near 20*log10(0.5/sqrt(2)) ≈ -9 dB
    assert db[:40].max() < -90
    mid = db[55:90]
    assert np.allclose(mid, -9.03, atol=1.0)


@pytest.mark.parametrize("codec", ["mulaw", "adpcm_ima"])
def test_lossy_codecs_keep_boundaries(spark, codec):
    # G.711/ADPCM quantization noise on digital silence stays far below
    # the -40 dBFS threshold, so boundaries survive lossy round-trips
    from semantic_log_detector_spark.functions.adpcm import encode_adpcm
    from semantic_log_detector_spark.functions.g711 import encode_mulaw

    sr = 8000
    sig = np.zeros(3 * sr, dtype=np.float64)
    s0, s1 = int(0.5 * sr), int(1.2 * sr)
    sig[s0:s1] = 0.5 * np.sin(2 * np.pi * 300 * np.arange(s1 - s0) / sr)
    enc = {"mulaw": encode_mulaw, "adpcm_ima": encode_adpcm}[codec]
    df = spark.createDataFrame(
        [("c0", enc(sig.astype(np.float32), sr), codec)],
        "clip_id string, bytes binary, codec string",
    )
    segs = speech_segments(df).toPandas()
    assert len(segs) == 1
    assert abs(segs["start_s"][0] - 0.5) <= 0.05
    assert abs(segs["end_s"][0] - 1.2) <= 0.05


def test_cut_segments_planted_bursts(spark):
    """Every planted burst comes back as a decodable utterance row whose
    payload is the padded slice of the source; clips with no decodable
    speech keep an accounting row with the reason."""
    from semantic_log_detector_spark.functions.audio import decode_clip
    from semantic_log_detector_spark.operators.segment import cut_segments

    clips = burst_clips(spark, 60, seed=9).cache()
    truth = clips.select("clip_id", F.explode("bursts").alias("b")).select(
        "clip_id", "b.start_s", "b.end_s").toPandas()
    n_bursts = {cid: len(g) for cid, g in truth.groupby("clip_id")}

    cut = cut_segments(clips, pad_ms=50.0).toPandas()
    ok = cut[cut["ok"]]
    # one utterance per planted burst, ids suffixed off the source
    got_counts = ok.groupby("src_clip_id")["seg_idx"].count().to_dict()
    assert got_counts == n_bursts
    assert (ok["clip_id"] == ok["src_clip_id"] + "#s" +
            ok["seg_idx"].astype(int).map("{:02d}".format)).all()
    # payload slice really is the window [start_s, end_s] at the src rate
    r = ok.iloc[0]
    pcm, sr = decode_clip(bytes(r["bytes"]), "pcm_s16le")
    assert sr == int(r["sr_hz"])
    assert len(pcm) == pytest.approx((r["end_s"] - r["start_s"]) * sr, abs=2)
    assert int(r["dur_ms"]) == pytest.approx(
        (r["end_s"] - r["start_s"]) * 1000, abs=1)
    clips.unpersist()


def test_cut_segments_accounting_and_chunking(spark):
    """No silent drops: undecodable / no-speech clips keep ok=false rows;
    max_segment_s chops a long run into deterministic pieces covering the
    original span."""
    from semantic_log_detector_spark.operators.segment import cut_segments

    sr = 16000
    t = np.arange(sr * 5) / sr
    long_speech = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    rows = [
        ("long", encode_wav(long_speech, sr), "pcm_s16le"),
        ("silent", encode_wav(np.zeros(sr, np.float32), sr), "pcm_s16le"),
        ("junk", b"\xde\xad" * 10, "pcm_s16le"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary, codec string")
    cut = cut_segments(df, pad_ms=0.0, max_segment_s=2.0).toPandas()
    by_src = {k: g for k, g in cut.groupby("src_clip_id")}
    # 5 s run chopped at 2 s → 3 pieces, contiguous, covering [0, 5]
    lg = by_src["long"].sort_values("seg_idx")
    assert lg["ok"].all() and len(lg) == 3
    assert lg["start_s"].iloc[0] == 0.0
    assert lg["end_s"].iloc[-1] == pytest.approx(5.0, abs=0.05)
    assert (lg["start_s"].values[1:] == lg["end_s"].values[:-1]).all()
    assert all(d <= 2001 for d in lg["dur_ms"])
    # accounting rows, one each, with reasons
    assert not by_src["silent"]["ok"].iloc[0]
    assert by_src["silent"]["err"].iloc[0] == "no_speech"
    assert not by_src["junk"]["ok"].iloc[0]
    assert by_src["junk"]["err"].iloc[0] is not None
    assert len(cut) == 3 + 2  # every input accounted

"""Container-level metadata probes (functions/containers.py) and the R068
container-meta check: undecodable opus/mp3 payloads get their Ogg/MPEG
framing verified (page CRC-32, frame-sync walk) and their container-derived
duration/sample-rate checked against the declared columns, inside the same
decode pass as R060-R067. Audio decode still refuses honestly (R062
machinery unchanged)."""

from __future__ import annotations

import numpy as np
import pytest

from semantic_log_detector_spark.functions.containers import (
    mp3_shell,
    ogg_opus_shell,
    probe_clip,
    probe_mp3,
    probe_ogg_opus,
)

# -------------------------------------------------------------- unit probes


@pytest.mark.parametrize("sr,ch,dur", [(16000, 1, 1000), (8000, 2, 2500),
                                       (48000, 1, 430)])
def test_ogg_opus_probe_roundtrip(sr, ch, dur):
    m = probe_ogg_opus(ogg_opus_shell(sr, dur, channels=ch, seed=sr + dur))
    assert m["container"] == "ogg_opus"
    assert m["input_sample_rate_hz"] == sr and m["channels"] == ch
    assert abs(m["duration_ms"] - dur) < 21  # one 20 ms junk-packet granule


@pytest.mark.parametrize("sr", [8000, 16000, 22050, 44100])
def test_mp3_probe_roundtrip(sr):
    m = probe_mp3(mp3_shell(sr, 3000))
    assert m["container"] == "mpeg_audio" and m["sample_rate_hz"] == sr
    assert m["layer"] == 3 and m["channels"] == 1
    assert abs(m["duration_ms"] - 3000) <= m["duration_grain_ms"]


def test_mp3_id3_tags_are_skipped():
    m = probe_mp3(mp3_shell(16000, 2000, id3=True))
    assert abs(m["duration_ms"] - 2000) <= m["duration_grain_ms"]


def test_ogg_crc_corruption_detected():
    b = bytearray(ogg_opus_shell(16000, 1000))
    b[80] ^= 1
    with pytest.raises(ValueError, match="CRC"):
        probe_ogg_opus(bytes(b))


def test_mp3_desync_detected():
    b = bytearray(mp3_shell(16000, 1000))
    b[1] ^= 0xE0  # break the first sync word
    with pytest.raises(ValueError, match="sync|truncated"):
        probe_mp3(bytes(b))


def test_mp3_midstream_truncation_detected():
    b = mp3_shell(16000, 1000)
    with pytest.raises(ValueError):
        probe_mp3(b[: len(b) - 7])


def test_ogg_missing_eos_detected():
    b = ogg_opus_shell(16000, 1000)
    # chop the final page off: find last OggS
    last = b.rfind(b"OggS")
    with pytest.raises(ValueError, match="end-of-stream|truncated"):
        probe_ogg_opus(b[:last])


def test_probe_clip_dispatch():
    assert probe_clip(mp3_shell(16000, 500), "mp3")["n_frames"] > 0
    with pytest.raises(KeyError):
        probe_clip(b"xx", "flac")


# -------------------------------------------------- R068 through the check


@pytest.fixture(scope="module")
def r068_res(spark):
    from semantic_log_detector_spark.checks.base import RunContext
    from semantic_log_detector_spark.checks.drift import drift_check

    rows = []
    # 1: clean opus shell — probed, no violation
    rows.append(("ok_opus", bytearray(ogg_opus_shell(16000, 1000, seed=1)),
                 16000, 1000, "opus", "t"))
    # 2: opus shell whose declared duration is wrong by 400 ms
    rows.append(("bad_dur", bytearray(ogg_opus_shell(16000, 1000, seed=2)),
                 16000, 1400, "opus", "t"))
    # 3: mp3 shell whose declared sample rate disagrees with the container
    rows.append(("bad_sr", bytearray(mp3_shell(16000, 1000)),
                 8000, 1000, "mp3", "t"))
    # 4: corrupted ogg page — structural violation
    corrupt = bytearray(ogg_opus_shell(16000, 1000, seed=3))
    corrupt[85] ^= 0xFF
    rows.append(("corrupt", corrupt, 16000, 1000, "opus", "t"))
    # 5: clean mp3 shell (duration within frame grain)
    rows.append(("ok_mp3", bytearray(mp3_shell(16000, 1008)),
                 16000, 1008, "mp3", "t"))
    df = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,"
        " transcript string",
    )
    return drift_check(df, RunContext(run_id="r068", num_parts=2))


def test_r068_mismatches_are_violations(r068_res):
    v = {r["clip_id"]: r for r in r068_res.violations.filter(
        "rule_id = 'R068_container_meta'").collect()}
    assert set(v) == {"bad_dur", "bad_sr", "corrupt"}
    assert "container_dur_ms" in v["bad_dur"]["observed"]
    assert "container_sr_hz" in v["bad_sr"]["observed"]
    assert "CRC" in v["corrupt"]["observed"]


def test_r068_clean_probes_are_not_violations(r068_res):
    bad = r068_res.violations.filter(
        "clip_id in ('ok_opus', 'ok_mp3')").collect()
    assert bad == []


def test_r068_probed_counter_surfaced(r068_res):
    # every probeable payload (clean or metadata-mismatched) counts; the
    # structurally-corrupt one does not reach a successful probe. The
    # counter rides the cached stats pass (CheckResult.resources[0]).
    stats = r068_res.resources[0]
    n = (stats.filter("kind = 'c' AND feature = 'container_probed'")
         .groupBy().sum("cnt").collect()[0][0])
    assert n == 4


def test_r068_verdict_rows_exist(r068_res):
    rows = r068_res.verdicts.filter(
        "rule_id = 'R068_container_meta'").collect()
    assert rows and any(not r["passed"] for r in rows)


def test_ogg_crc_vectorized_matches_bitwise_definition():
    # the tree-combined vector path (len >= 2048) and the scalar path must
    # both equal the independent bit-by-bit RFC 3533 definition, across
    # the chunk/padding boundaries (power-of-two row counts, partial rows)
    from semantic_log_detector_spark.functions.containers import ogg_crc

    def bitwise(data):
        r = 0
        for b in data:
            r ^= b << 24
            for _ in range(8):
                r = (((r << 1) ^ 0x04C11DB7) if r & 0x80000000
                     else (r << 1)) & 0xFFFFFFFF
        return r

    rng = np.random.default_rng(11)
    for n in [0, 1, 63, 64, 65, 2047, 2048, 2049, 4096 - 1, 4096, 8191, 65307]:
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert ogg_crc(data) == bitwise(data), n

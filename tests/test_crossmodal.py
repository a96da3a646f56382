"""Cross-modal dedup (operators/crossmodal.py): duplicates hidden in ONE
modality are found, and modality-chained duplicates collapse into one
cluster with one canonical keep id."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.operators.crossmodal import (
    cross_modal_dup_clusters,
    cross_modal_dup_pairs,
)


def _melody(sr: int, band_idx, seed: int) -> np.ndarray:
    bands = np.geomspace(200.0, 3800.0, 16)
    n = sr
    t = np.arange(n) / sr
    seg = n // len(band_idx)
    sig = np.zeros(n)
    for k in range(len(band_idx)):
        sl = slice(k * seg, (k + 1) * seg if k < len(band_idx) - 1 else n)
        sig[sl] = 0.5 * np.sin(2 * np.pi * bands[band_idx[k]] * t[sl])
    sig += 0.02 * np.random.default_rng(seed).standard_normal(n)
    return sig.astype(np.float32)


def _text(seed: int) -> str:
    words = [f"tok{w}" for w in np.random.default_rng(seed).integers(0, 500, 40)]
    return " ".join(words)


@pytest.fixture(scope="module")
def bimodal(spark):
    from semantic_log_detector_spark.functions.audio import encode_wav
    from semantic_log_detector_spark.functions.g711 import encode_mulaw

    sr = 16000
    rng = np.random.default_rng(77)
    mel = {k: rng.integers(0, 16, 15) for k in ("a", "t1", "t2", "c", "c3", "s")}
    rows = [
        # audio-only dup: same melody, different codec+noise, different text
        ("a1", encode_wav(_melody(sr, mel["a"], 1), sr), "pcm_s16le", _text(1)),
        ("a2", encode_mulaw(_melody(sr, mel["a"], 2), sr), "mulaw", _text(2)),
        # text-only dup: different melodies, same transcript
        ("t1", encode_wav(_melody(sr, mel["t1"], 3), sr), "pcm_s16le", _text(3)),
        ("t2", encode_wav(_melody(sr, mel["t2"], 4), sr), "pcm_s16le", _text(3)),
        # chain: c1 ~audio~ c2 ~text~ c3 — must collapse to ONE cluster
        ("c1", encode_wav(_melody(sr, mel["c"], 5), sr), "pcm_s16le", _text(5)),
        ("c2", encode_mulaw(_melody(sr, mel["c"], 6), sr), "mulaw", _text(6)),
        ("c3", encode_wav(_melody(sr, mel["c3"], 7), sr), "pcm_s16le", _text(6)),
        # singleton
        ("s1", encode_wav(_melody(sr, mel["s"], 8), sr), "pcm_s16le", _text(8)),
    ]
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "codec", "transcript"])
    clips = spark.createDataFrame(pdf[["clip_id", "bytes", "codec"]]).cache()
    transcripts = spark.createDataFrame(pdf[["clip_id", "transcript"]]).cache()
    clips.count(), transcripts.count()
    yield clips, transcripts
    clips.unpersist(), transcripts.unpersist()


def test_cross_modal_pairs_and_flags(bimodal):
    clips, transcripts = bimodal
    got = {
        (r.id_a, r.id_b): (r.via_audio, r.via_text)
        for r in cross_modal_dup_pairs(clips, transcripts).collect()
    }
    assert got == {
        ("a1", "a2"): (True, False),
        ("t1", "t2"): (False, True),
        ("c1", "c2"): (True, False),
        ("c2", "c3"): (False, True),
    }


def test_cross_modal_clusters_chain_and_canonical(bimodal):
    clips, transcripts = bimodal
    stats = {"audio": {}, "text": {}}
    rows = cross_modal_dup_clusters(
        clips, transcripts, drop_stats=stats
    ).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.id)
    # the chain crosses modalities and still lands in ONE cluster
    assert by_cluster == {
        "a1": {"a1", "a2"},
        "t1": {"t1", "t2"},
        "c1": {"c1", "c2", "c3"},
    }
    canon = {r.id for r in rows if r.is_canonical}
    assert canon == {"a1", "t1", "c1"}
    assert all(r.cluster_size == len(by_cluster[r.cluster_id]) for r in rows)
    # modality flags say WHY each clip is implicated (bridge carries both)
    flags = {r.id: (r.via_audio, r.via_text) for r in rows}
    assert flags["c1"] == (True, False)
    assert flags["c2"] == (True, True)
    assert flags["c3"] == (False, True)
    assert flags["a1"] == (True, False) and flags["t2"] == (False, True)
    # singleton never appears
    assert "s1" not in flags
    assert stats["cc_converged"]

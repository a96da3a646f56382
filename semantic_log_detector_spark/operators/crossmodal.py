"""Cross-modal duplicate detection over audio clip + transcript pairs.

The corpus the north star describes is bimodal: every row carries audio
bytes AND a transcript. A duplicate can hide in either modality alone —
the same recording re-encoded under a different codec with a re-run ASR
pass shares no transcript bytes (acoustic dup, text-invisible), and the
same transcript re-read by a different speaker shares no audio (text dup,
audio-invisible). Single-modality dedup therefore under-deletes; worse,
duplicates CHAIN across modalities (A ~audio~ B ~text~ C must collapse to
ONE kept clip). This module unions the two pair graphs and runs the
shared connected-components pass over the combined edges:

- ``cross_modal_dup_pairs``: the union of `audio_dedup.audio_dup_pairs`
  (60-bit melody fingerprint, exact Hamming-≤k pigeonhole) and
  `dedup.simhash_hamming_pairs` over the transcript text (60-bit SimHash,
  the SAME pigeonhole join) with per-pair modality flags.
- ``cross_modal_dup_clusters``: `dedup.dup_clusters` (min-label
  propagation + pointer jumping) over the union graph, plus per-node
  modality flags so the report can say WHY a clip was deduplicated.

Scale shape: both pair builders keep payloads in the scan stage and
shuffle only (id, 60-bit signature); the union is edge-scale; the
components loop never touches the corpus. The reference has no
cross-modal analog (its payloads are log lines, one modality) — this is
the bimodal completion of the dedup ladder the graft's data model needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .audio_dedup import audio_dup_pairs
from .dedup import dup_clusters, simhash_hamming_pairs


def cross_modal_dup_pairs(
    clips: DataFrame,
    transcripts: DataFrame,
    clip_id: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    text_col: str = "transcript",
    audio_max_hamming: int = 3,
    text_max_hamming: int = 3,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Duplicate pairs across BOTH modalities: (id_a, id_b, via_audio,
    via_text), id_a < id_b as strings. A pair found by both rungs carries
    both flags. ``drop_stats`` (optional dict) receives the two rungs'
    bucket-guard accounting under the sub-keys ``'audio'`` and ``'text'``
    (they would otherwise overwrite each other's counts)."""
    audio_stats = text_stats = None
    if isinstance(drop_stats, dict):
        audio_stats = drop_stats.setdefault("audio", {})
        text_stats = drop_stats.setdefault("text", {})
    ap = audio_dup_pairs(
        clips, clip_id, bytes_col, codec_col,
        max_hamming=audio_max_hamming, drop_stats=audio_stats,
    ).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
        F.lit(True).alias("via_audio"),
        F.lit(False).alias("via_text"),
    )
    tp = simhash_hamming_pairs(
        transcripts, text_col, clip_id,
        max_hamming=text_max_hamming, drop_stats=text_stats,
    ).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
        F.lit(False).alias("via_audio"),
        F.lit(True).alias("via_text"),
    )
    return (
        ap.unionByName(tp)
        .groupBy("id_a", "id_b")
        .agg(
            F.max("via_audio").alias("via_audio"),
            F.max("via_text").alias("via_text"),
        )
    )


def cross_modal_dup_clusters(
    clips: DataFrame,
    transcripts: DataFrame,
    clip_id: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    text_col: str = "transcript",
    audio_max_hamming: int = 3,
    text_max_hamming: int = 3,
    max_iters: int = 25,
    drop_stats: dict | None = None,
) -> DataFrame:
    """Connected components over the UNION of the acoustic and transcript
    duplicate graphs — so modality-chained duplicates (A ~audio~ B ~text~
    C) collapse to one cluster with one canonical keep id.

    Returns (id, cluster_id, cluster_size, is_canonical, via_audio,
    via_text) for every clip that appears in at least one pair; the
    modality flags say which rung(s) implicated the clip (both true for
    bridge nodes). Same convergence contract as `dedup.dup_clusters`."""
    pairs = cross_modal_dup_pairs(
        clips, transcripts, clip_id, bytes_col, codec_col, text_col,
        audio_max_hamming, text_max_hamming, drop_stats,
    ).localCheckpoint(eager=False)  # consumed twice: components + flags
    clusters = dup_clusters(pairs, max_iters=max_iters, drop_stats=drop_stats)
    node_flags = (
        pairs.select(F.col("id_a").alias("id"), "via_audio", "via_text")
        .unionByName(
            pairs.select(F.col("id_b").alias("id"), "via_audio", "via_text")
        )
        .groupBy("id")
        .agg(
            F.max("via_audio").alias("via_audio"),
            F.max("via_text").alias("via_text"),
        )
    )
    return clusters.join(node_flags, "id")

"""Dataset card: the corpus datasheet an audio training set ships with.

Validation answers "does this corpus violate its contracts"; a dataset
card answers "what IS this corpus" — size, modality mix, duration /
speech / loudness distributions, decode honesty, duplication rate. This
stage produces that card from ONE `audio_profile` decode pass plus
verdict-sized aggregates, as JSON and markdown. (Generalizes the
reference's per-run report stats block, src/detector/report.py:40-77,
from rule outcomes to corpus characterization.)

Scale: the payload is read exactly once (the profile pass); every
aggregate downstream is over the thin per-clip profile frame (~50 B/row)
— percentile sketches, codec counts, a dup-pair count over the
fingerprint pigeonhole join. Nothing here collects more than fixed-size
summary rows to the driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PCTS = [0.01, 0.25, 0.5, 0.75, 0.99]


def build_datacard(
    clips: DataFrame,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    max_hamming: int = 3,
    with_pitch: bool = False,
    drop_stats: dict | None = None,
) -> dict:
    """Corpus datasheet dict from one decode pass + small aggregates.

    Sections: counts (total / decodable / fake / undecodable), codecs
    (per-codec clip counts), duration / speech / loudness percentile
    tables, speech totals (hours), duplication (acoustic dup pairs and
    clips involved). ``with_pitch=True`` opts into the pitch profile's
    extra FFT work and adds median-F0 / voiced-ratio percentile tables
    plus the flat-pitch contamination share (voiced, near-constant F0 —
    tones/hum an energy VAD counts as speech). The profile is persisted
    across its uses and recorded in ``drop_stats['persisted']``
    (release with `dedup.unpersist_all`).
    """
    from ..operators.audio_curate import _flat_pitch, audio_profile
    from ..operators.dedup import hamming60_pairs

    prof = audio_profile(clips, id_col, bytes_col, codec_col,
                         with_pitch=with_pitch).persist()
    if drop_stats is not None:
        drop_stats.setdefault("persisted", []).append(prof)

    total = prof.count()
    counts_row = prof.agg(
        F.sum(F.col("decode_ok").cast("long")).alias("decodable"),
        F.sum((F.col("decode_ok") & F.col("fake")).cast("long")).alias("fake"),
        F.sum(F.col("speech_s")).alias("speech_s_total"),
        F.sum(F.col("total_s")).alias("audio_s_total"),
    ).collect()[0]
    codecs = {
        r[codec_col]: r["n"]
        for r in clips.groupBy(codec_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }

    def pct_table(col):
        row = prof.filter(F.col(col).isNotNull()).agg(
            *[F.round(F.expr(f"percentile({col}, {p})"), 3).alias(f"p{int(p*100):02d}")
              for p in _PCTS]
        ).collect()[0]
        return {k: row[k] for k in row.asDict()}

    real = prof.filter(F.col("decode_ok") & ~F.col("fake"))
    pairs = hamming60_pairs(
        real.filter(F.col("fp").isNotNull()).select(
            F.col("clip_id").alias("id"), F.col("fp").alias("sh")),
        max_hamming, drop_stats=drop_stats, op="datacard",
    )
    # distinct-ids stays distributed (explode → distinct over the edge
    # table) — never a collect_list of all pairs into one agg buffer
    pairs = pairs.persist()
    if drop_stats is not None:
        drop_stats.setdefault("persisted", []).append(pairs)
    n_pairs = pairs.count()
    n_clips_in_pairs = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
        .distinct().count()
    )
    dup_row = {"n_pairs": n_pairs, "n_clips_in_pairs": n_clips_in_pairs}

    card = {
        "counts": {
            "total_clips": total,
            "decodable": int(counts_row["decodable"] or 0),
            "fake_decoded": int(counts_row["fake"] or 0),
            "undecodable": total - int(counts_row["decodable"] or 0),
            "fake_share": round((counts_row["fake"] or 0) / max(total, 1), 4),
        },
        "codecs": codecs,
        "hours": {
            "audio": round((counts_row["audio_s_total"] or 0.0) / 3600.0, 2),
            "speech": round((counts_row["speech_s_total"] or 0.0) / 3600.0, 2),
        },
        "duration_s": pct_table("total_s"),
        "speech_ratio": pct_table("speech_ratio"),
        "loudness_lufs": pct_table("loudness_lufs"),
        "snr_db": pct_table("snr_db"),
        **({
            "median_f0_hz": pct_table("median_f0_hz"),
            "voiced_ratio": pct_table("voiced_ratio"),
            "flat_pitch": {
                "n_clips": prof.filter(_flat_pitch(0.8, 5.0)).count(),
            },
        } if with_pitch else {}),
        "acoustic_duplication": {
            "dup_pairs": int(dup_row["n_pairs"]),
            "clips_in_dup_pairs": int(dup_row["n_clips_in_pairs"] or 0),
            "dup_clip_share": round(
                (dup_row["n_clips_in_pairs"] or 0) / max(total, 1), 4),
            "max_hamming": max_hamming,
        },
    }
    return card


def render_datacard_md(card: dict) -> str:
    """Markdown rendering of `build_datacard`'s dict."""
    c, h, d = card["counts"], card["hours"], card["acoustic_duplication"]
    lines = [
        "# Dataset card",
        "",
        "## Counts",
        f"- clips: {c['total_clips']:,} (decodable {c['decodable']:,}, "
        f"fake-decoded {c['fake_decoded']:,} = {c['fake_share']:.2%}, "
        f"undecodable {c['undecodable']:,})",
        f"- audio: {h['audio']} h (speech {h['speech']} h)",
        "",
        "## Codecs",
    ]
    for codec, n in sorted(card["codecs"].items(), key=lambda kv: -kv[1]):
        lines.append(f"- {codec}: {n:,}")
    for title, key in (("Duration (s)", "duration_s"),
                       ("Speech ratio", "speech_ratio"),
                       ("Integrated loudness (LUFS)", "loudness_lufs"),
                       ("Estimated SNR (dB)", "snr_db"),
                       ("Median F0 (Hz)", "median_f0_hz"),
                       ("Voiced ratio", "voiced_ratio")):
        if key not in card:  # pitch tables are opt-in
            continue
        t = card[key]
        lines += ["", f"## {title}",
                  "| " + " | ".join(t) + " |",
                  "|" + "---|" * len(t),
                  "| " + " | ".join(str(v) for v in t.values()) + " |"]
    if "flat_pitch" in card:
        n = card["flat_pitch"]["n_clips"]
        share = n / max(c["total_clips"], 1)
        lines += ["", "## Flat-pitch contamination",
                  f"- {n:,} clips voiced with a near-constant F0 track "
                  f"({share:.2%} of corpus) — synthetic tones / hum that "
                  "an energy VAD counts as speech"]
    lines += [
        "",
        "## Acoustic duplication",
        f"- {d['dup_pairs']:,} Hamming-≤{d['max_hamming']} fingerprint pairs; "
        f"{d['clips_in_dup_pairs']:,} clips involved "
        f"({d['dup_clip_share']:.2%} of corpus)",
        "",
    ]
    return "\n".join(lines)


def write_datacard(
    clips: DataFrame,
    out_dir: str,
    **kw,
) -> dict:
    """Build the card and persist ``datacard.json`` + ``datacard.md``
    under ``out_dir``; returns the dict."""
    from ..operators.dedup import unpersist_all

    stats = kw.pop("drop_stats", None)
    own_stats = stats if stats is not None else {}
    card = build_datacard(clips, drop_stats=own_stats, **kw)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "datacard.json"), "w") as f:
        json.dump(card, f, indent=2)
    with open(os.path.join(out_dir, "datacard.md"), "w") as f:
        f.write(render_datacard_md(card))
    if stats is None:
        unpersist_all(own_stats)
    return card

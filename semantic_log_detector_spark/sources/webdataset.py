"""WebDataset-style tar-shard source/sink for audio + transcript corpora.

Large speech corpora ship as directories of .tar shards whose members pair
by basename — ``<key>.wav`` + ``<key>.txt`` (WebDataset convention; the
format behind most public audio-LM corpora). This source turns a shard
directory into the engine's clip table (clip_id, bytes, sr_hz, dur_ms,
codec, transcript, shard) with ONE task per shard — the natural unit of
parallelism and exactly how WebDataset loaders shard work across workers.

Scale: shards are streamed member-by-member with stdlib ``tarfile``
(nothing is extracted to disk, one member in memory at a time); the shard
list is distributed via ``spark.range`` over the sorted listing so a
million shards is a million tasks, not a driver loop. sr/dur metadata for
WAV members comes from a header-only parse (no PCM decode — the suite's
decode pass is the authority that VALIDATES it, R061); other codecs leave
sr/dur null, which the row rules treat as a finding, not a crash.

The sink is the inverse: one tar shard per partition, members written as
``<key>.<ext>`` (+ ``<key>.txt`` when a transcript column is present), so
a curated/augmented corpus exports back to the format the training stack
reads. Shard names embed the partition id — concurrent tasks never
collide; a task retry overwrites its own shard (idempotent).

Local/NFS paths only (tarfile is a POSIX-file API): the guard refuses
URI schemes up front, same policy as sources/payload_scan.py.
"""

from __future__ import annotations

import io
import os
import struct
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: member extension → engine codec label
EXT_CODEC = {
    ".wav": "pcm_s16le",
    ".flac": "flac",
    ".opus": "opus",
    ".mp3": "mp3",
}
_TRANSCRIPT_EXTS = (".txt", ".transcript")


def _wav_header_meta(head: bytes) -> tuple[int | None, int | None]:
    """(sr_hz, dur_ms) from a RIFF header-only read; (None, None) when the
    chunks aren't in the first KB — the decode pass remains the authority."""
    if len(head) < 44 or head[:4] != b"RIFF" or head[8:12] != b"WAVE":
        return None, None
    off, sr, bits, channels, data_size = 12, None, None, None, None
    while off + 8 <= len(head):
        cid, csize = struct.unpack_from("<4sI", head, off)
        body = off + 8
        if cid == b"fmt " and body + 16 <= len(head):
            _tag, channels, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", head, body)
        elif cid == b"data":
            data_size = csize
            break
        off = body + csize + (csize & 1)
    if not sr or not bits or not channels or data_size is None:
        return None, None
    n = data_size // (channels * bits // 8)
    return int(sr), int(round(n * 1000.0 / sr))


def list_shards(path: str) -> list[str]:
    """Sorted .tar shard paths under ``path`` (non-recursive). Refuses URI
    schemes — tarfile needs a POSIX file."""
    if "://" in path:
        raise ValueError(
            f"webdataset source needs a local/NFS path, got {path!r}")
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Shard directory → clip table. One task per shard; members pair by
    basename (``key.wav`` + ``key.txt`` → one row)."""
    shards = list_shards(path)
    if not shards:
        raise ValueError(f"no .tar shards under {path!r}")
    # round-robin repartition: exactly one shard per task (hash-by-column
    # would collide shards into some tasks and leave others empty)
    sdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(shards)], "shard_idx long, shard string"
    ).repartition(len(shards))

    def gen(batches):
        for pdf in batches:
            for shard in pdf["shard"]:
                rows: dict[str, dict] = {}
                with tarfile.open(shard, "r") as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        key, ext = os.path.splitext(os.path.basename(m.name))
                        ext = ext.lower()
                        r = rows.setdefault(key, {})
                        if ext in EXT_CODEC:
                            buf = tf.extractfile(m).read()
                            r["bytes"], r["codec"] = buf, EXT_CODEC[ext]
                            if ext == ".wav":
                                r["sr_hz"], r["dur_ms"] = _wav_header_meta(
                                    buf[:1024])
                            elif ext == ".flac":
                                # STREAMINFO is a header-only read too; the
                                # decode pass stays the validating authority
                                try:
                                    from ..functions.flac import _parse_streaminfo

                                    sr, _ch, _bps, total, _md5, _off = (
                                        _parse_streaminfo(buf))
                                    if total > 0:
                                        r["sr_hz"] = int(sr)
                                        r["dur_ms"] = int(
                                            round(total * 1000.0 / sr))
                                except Exception:
                                    pass  # null metadata, row rules flag it
                        elif ext in _TRANSCRIPT_EXTS:
                            r["transcript"] = (
                                tf.extractfile(m).read().decode(
                                    "utf-8", errors="replace").strip())
                out = [
                    {
                        "clip_id": k,
                        "bytes": r.get("bytes"),
                        "sr_hz": r.get("sr_hz"),
                        "dur_ms": r.get("dur_ms"),
                        "codec": r.get("codec"),
                        "transcript": r.get("transcript"),
                        "shard": os.path.basename(shard),
                    }
                    for k, r in sorted(rows.items())
                ]
                yield pd.DataFrame(
                    out,
                    columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                             "transcript", "shard"],
                ).astype({"sr_hz": "Int32", "dur_ms": "Int32"})

    return sdf.mapInPandas(
        gen,
        schema="clip_id string, bytes binary, sr_hz int, dur_ms int,"
               " codec string, transcript string, shard string",
    )


_CODEC_EXT = {v: k for k, v in EXT_CODEC.items()}


def write_webdataset(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    id_col: str = "clip_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    transcript_col: str | None = "transcript",
) -> int:
    """Clip table → ``shard-%06d.tar`` under ``path``; returns the shard
    count. Rows hash-route to shards by id (deterministic layout for a
    deterministic input); rows with null payloads are skipped inside their
    shard — export the quarantined view separately if you need them."""
    if "://" in path:
        raise ValueError(f"webdataset sink needs a local/NFS path, got {path!r}")
    os.makedirs(path, exist_ok=True)
    n_shards = shards or max(df.rdd.getNumPartitions(), 1)
    has_txt = bool(transcript_col) and transcript_col in df.columns
    cols = [id_col, bytes_col, codec_col] + ([transcript_col] if has_txt else [])
    d = df.select(*cols).repartition(n_shards, F.xxhash64(id_col))

    # payloads reach Python through mapInPandas (Arrow batches), not the
    # pickled-RDD path — at corpus scale the Arrow socket is the only
    # transfer that keeps up with the tar writer. Rows within one shard
    # arrive across several Arrow batches; the tar stays open per task and
    # members are appended in arrival order (hash-routing already fixes
    # WHICH shard every key lands in, so the layout is deterministic up to
    # member order, which WebDataset readers do not depend on).
    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"shard-{pid:06d}.tar")
        tmp = out + ".tmp"
        tf, wrote = None, False
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if tf is None:
                    tf = tarfile.open(tmp, "w")
                for key, buf, codec, txt in zip(
                    pdf[id_col].astype(str),
                    pdf[bytes_col],
                    pdf[codec_col],
                    pdf[transcript_col] if has_txt else [None] * len(pdf),
                ):
                    if buf is None:
                        continue
                    wrote = True
                    ext = _CODEC_EXT.get(codec, ".bin")
                    info = tarfile.TarInfo(f"{key}{ext}")
                    info.size = len(buf)
                    tf.addfile(info, io.BytesIO(bytes(buf)))
                    if txt is not None:
                        t = str(txt).encode("utf-8")
                        ti = tarfile.TarInfo(f"{key}.txt")
                        ti.size = len(t)
                        tf.addfile(ti, io.BytesIO(t))
        finally:
            if tf is not None:
                tf.close()
        if wrote:
            os.replace(tmp, out)
        elif os.path.exists(tmp):
            os.remove(tmp)
        yield pd.DataFrame({"n": [1 if wrote else 0]})

    d.mapInPandas(write_part, schema="n int").agg(
        F.sum("n")).collect()  # one action drives the writes
    return n_shards

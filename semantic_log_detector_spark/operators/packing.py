"""Deterministic sequence packing for LLM training-data pipelines.

Packing concatenates documents into fixed token-budget context windows so
no training step wastes padding. The reference has no packing analog (its
batcher, `src/ids/data_loader.py`, pads each flow window to a fixed
length); this operator is part of the training-data-pipeline surface the
engine adds on top of the reference's validation semantics.

Greedy first-fit packing is inherently order-dependent — a global greedy
pack would serialize the corpus through one task. The 100 TB shape is
instead: bucket every doc by a deterministic hash of its id, pack each
bucket independently in hash order. Assignment is then a pure function of
(id set, context_tokens, num_buckets) — reproducible across runs, engines
and partitionings, exactly like `splits.hash_split` — and the only
shuffle is one hash partition on the bucket key. Parallelism and per-task
memory are both set by ``num_buckets`` (choose ≫ cores at scale; each
task holds one bucket's (id, n_tokens) pairs, ~16 bytes/doc).

The per-bucket pack is a genuine sequential scan (each decision depends
on the running fill), so it runs as a plain O(bucket-size) loop over
numpy arrays inside one `applyInPandas` group — not a per-row UDF in the
Spark sense: one Python call per bucket, Arrow-batched in and out.

Packing rule (first-fit in (md5-hash, id) order within a bucket):

* the first doc of a bucket opens window 0, whatever its size;
* a doc is appended to the current window iff ``fill + n <= context``,
  else it opens the next window;
* docs longer than the context therefore sit alone in their window and
  are flagged ``oversize`` for the caller to chunk — silently truncating
  tokens here would corrupt the corpus accounting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    context_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    order: str = "hash",
) -> DataFrame:
    """Assign each document to a (bucket, window) slot under a greedy
    first-fit pack with per-window capacity ``context_tokens``.

    ``order`` picks the in-bucket scan order, both deterministic:
    ``"hash"`` (md5 order — the oracle-replayed default; content-agnostic,
    so window composition is an unbiased shuffle of the bucket) or
    ``"size"`` (first-fit-DECREASING: largest docs first, the classic
    bin-packing heuristic — tighter windows, less padding, at the cost of
    size-correlated windows; shuffle window order downstream if training
    cares).

    Returns one row per input doc with a non-null id:
    ``(doc_id, bucket, window_idx, pos_in_window, n_tokens, oversize)``.
    ``window_idx`` is dense per bucket; ``pos_in_window`` is the doc's
    0-based slot inside its window. Null-id docs are dropped (their hash
    is null), mirroring `splits.hash_split`'s null surfacing contract —
    count them upstream if they matter.
    """
    if context_tokens <= 0:
        raise ValueError("context_tokens must be positive")
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    if order not in ("hash", "size"):
        raise ValueError(f"order must be 'hash' or 'size', got {order!r}")
    from .textstats import token_count

    cap = int(context_tokens)
    # the id keeps its NATIVE type end-to-end (string/hash-keyed corpora —
    # the common case in LLM pipelines — must round-trip with identity
    # intact; round 3 cast to long, silently nulling non-numeric ids)
    id_type = df.schema[id_col].dataType.simpleString()
    d = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            # Null text counts as 0 tokens (coalesce keeps the Arrow batch
            # integral; a null would float-ify the whole pandas column).
            F.coalesce(token_count(F.col(text_col)), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
            # Same engine-portable 60-bit md5 device as splits.hash_split /
            # dedup.simhash60_md5: non-negative, so % == pmod.
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("__h"),
        )
        .withColumn("bucket", F.col("__h") % num_buckets)
    )

    out_schema = (
        f"doc_id {id_type}, bucket long, window_idx long, pos_in_window long,"
        " n_tokens long, oversize boolean"
    )

    def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if order == "size":
            pdf = pdf.sort_values(
                ["n_tokens", "__h", "doc_id"],
                ascending=[False, True, True],
                kind="mergesort",
            ).reset_index(drop=True)
        else:
            pdf = pdf.sort_values(["__h", "doc_id"], kind="mergesort").reset_index(
                drop=True
            )
        n = pdf["n_tokens"].to_numpy()
        win = np.empty(len(pdf), dtype=np.int64)
        pos = np.empty(len(pdf), dtype=np.int64)
        w = 0
        p = 0
        fill = 0
        for i, tok in enumerate(n):
            if i > 0 and fill + tok > cap:
                w += 1
                p = 0
                fill = 0
            win[i] = w
            pos[i] = p
            fill += tok
            p += 1
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bucket"],
                "window_idx": win,
                "pos_in_window": pos,
                "n_tokens": n,
                "oversize": n > cap,
            }
        )

    return d.groupBy("bucket").applyInPandas(_pack_bucket, out_schema)


def packing_summary(packed: DataFrame, context_tokens: int) -> DataFrame:
    """Window-level utilization accounting over `pack_sequences` output:
    one row per (bucket, window_idx) with doc count, token fill and the
    padding that a fixed-window trainer would burn. Oversize windows
    report negative padding (their single doc exceeds the context)."""
    return (
        packed.groupBy("bucket", "window_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("fill_tokens"),
        )
        .withColumn(
            "padding_tokens", F.lit(int(context_tokens)) - F.col("fill_tokens")
        )
    )

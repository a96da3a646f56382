"""Deterministic stratified splitting for training-data pipelines.

The reference's stratified train/val/test split (`src/ids/data_loader.py:
236-268` via sklearn ``train_test_split(stratify=…)``) is row-order- and
library-dependent; at 10^12 rows a split must instead be a pure function
of each row's id so it is reproducible across runs, engines and
partitionings, and requires no shuffle at all — assignment is a narrow
JVM-side projection.

``hash_split`` buckets ``md5(id)`` (the first 15 hex chars → a 60-bit
non-negative long, reproducible in any ANSI-SQL engine — same device as
``dedup.simhash60_md5``) into ``granularity`` slots and maps cumulative
fraction ranges to split names. md5 is uniform, so each split's size
converges to its fraction and, because assignment is independent of any
feature, every stratum is split in the same proportions in expectation —
the hash-at-scale answer to sklearn's exact-but-centralized stratify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_split(
    id_col: Column, fractions: dict[str, float], granularity: int = 10_000
) -> Column:
    """Split-name column from a deterministic md5 bucket of ``id_col``.

    ``fractions`` maps split name → fraction; fractions must sum to 1
    (the last split absorbs rounding). Example:
    ``hash_split(F.col("doc_id"), {"train": .8, "val": .1, "test": .1})``.

    A NULL id yields a NULL split (surfaced for the caller to count or
    reject) — silently routing null-key rows into the catch-all split
    would concentrate them all in one split unnoticed.
    """
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must be non-empty and sum to 1")
    h = (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast("long")
        % granularity
    )
    items = list(fractions.items())
    expr = None
    cum = 0
    for name, frac in items[:-1]:
        cum += int(round(frac * granularity))
        cond = h < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last_name = items[-1][0]
    tail = expr.otherwise(last_name) if expr is not None else F.lit(last_name)
    return F.when(h.isNull(), F.lit(None).cast("string")).otherwise(tail)


def token_budget_sample(
    df,
    budget_tokens: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    granularity: int = 10_000,
):
    """Deterministic per-source token-budget downsample — the data-mixing
    primitive: "give me ≈``budget_tokens`` tokens from EACH source, chosen
    reproducibly".

    Two passes, both scale-safe at 10^12 docs:

    1. Exact per-source token totals — one partial-aggregated groupBy over
       a narrow (source, n_tokens) projection; the result is
       sources-cardinality tiny and is **broadcast** back.
    2. A stateless keep filter: ``md5_bucket(id)/granularity <
       budget/total``. md5 is uniform, so kept tokens converge to the
       budget (± one bucket's worth) per source, and membership is a pure
       function of the id — reproducible across runs, engines and
       partitionings, exactly like ``hash_split``.

    Deliberately NOT a running-sum window over md5-ordered docs: that
    would be exact to the token, but a per-source global sort serializes
    each source into one task — the opposite of the 100 TB shape.

    Returns kept rows: (id, source, n_tokens). Null ids are dropped (their
    bucket is null), mirroring hash_split's null surfacing semantics.
    """
    from .textstats import token_count

    d = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("long")
            % granularity
        ).alias("__bucket"),
    )
    totals = d.groupBy("source").agg(F.sum("n_tokens").alias("__total"))
    keep_frac = F.least(
        F.lit(1.0), F.lit(float(budget_tokens)) / F.col("__total")
    )
    return (
        d.join(F.broadcast(totals), "source")
        .filter(F.col("__bucket") < keep_frac * granularity)
        .select("id", "source", "n_tokens")
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    split_id_col: str = "id",
    split_col: str = "split",
) -> DataFrame:
    """Cross-split near-duplicate leakage audit.

    ``pairs`` is any dup rung's pair output (MinHash/SimHash text pairs,
    acoustic fingerprint pairs, embedding near-dups); ``splits`` maps id →
    split name (e.g. a `hash_split` projection). Returns the pairs whose
    members land in DIFFERENT splits, annotated (split_a, split_b) — the
    eval-contamination every training pipeline must audit: a test item
    whose near-duplicate sits in train inflates eval.

    Scale: two equi-joins of the pair table against the id→split map —
    the pair table is edges (bounded by the dup rungs' own caps), the map
    is a projection of the corpus; both join keys are ids, so AQE
    broadcasts the smaller side when it fits and nothing here is ever
    all-pairs. Ids missing from ``splits`` surface as NULL split names
    (kept, not dropped — an unmapped id in a pair is itself a finding).
    """
    sa = splits.select(F.col(split_id_col).alias(id_a),
                       F.col(split_col).alias("split_a"))
    sb = splits.select(F.col(split_id_col).alias(id_b),
                       F.col(split_col).alias("split_b"))
    joined = pairs.join(sa, id_a, "left").join(sb, id_b, "left")
    return joined.filter(
        ~(F.col("split_a").eqNullSafe(F.col("split_b")))
    )


def split_leakage_summary(leaks: DataFrame) -> DataFrame:
    """(split_a, split_b, n_pairs) rollup of a `split_leakage` result,
    split names sorted within the pair so (train,test) and (test,train)
    count as one direction."""
    lo = F.least("split_a", "split_b")
    hi = F.greatest("split_a", "split_b")
    return (
        leaks.select(lo.alias("split_lo"), hi.alias("split_hi"))
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("split_lo", "split_hi")
    )

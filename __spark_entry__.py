"""Driver contract for the spark-graft builder (PySpark target).

One queries()/oracle_sql() pair per operator family from SURVEY.md §2,
exercised over the driver-generated testdata tables. Every query is
DuckDB-oracled — including q36 (the clips verdict suite), whose synthetic
input is exported to a fixed parquet path at construction time so the SQL
twin re-derives the rule verdicts from the same rows. The approximate
ladder is machine-checked three different ways:

- q33 MinHash-LSH: output = exact pair set ⊕ lsh_found — a recall miss
  flips a boolean (hash mismatch), a precision miss adds a row.
- q34 SimHash: md5-60-bit simhash with 4×15-bit pigeonhole bands is a
  COMPLETE hamming-≤3 search; the oracle recomputes the simhash in SQL.
- q35 hyperplane LSH top-k: the oracle regenerates the seeded hyperplanes
  as literals and replicates signatures → bucket join → in-bucket exact
  ranking bit-for-bit.

All float outputs are rounded identically on both sides (+ 0.0 where a
signed zero could differ); every computed column is aliased identically
on both sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

sys.path.insert(0, str(Path(__file__).resolve().parent))

_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary (SURVEY.md A1 family)."""
    return _q01_pricing_summary(spark, "/root/testdata/sf0.001")


# ------------------------------------------------------------- query catalog


def _q01_pricing_summary(spark, sf):
    l = _t(spark, sf, "lineitem")
    # exact decimal sums: double summation order differs across engines and
    # partitionings, which flips 6-dp rounding; decimal accumulation is exact
    dec = lambda c: F.col(c).cast("decimal(30,12)")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,12)")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q02_nation_revenue(spark, sf):
    o, c, n = _t(spark, sf, "orders"), _t(spark, sf, "customer"), _t(spark, sf, "nation")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,12)")).cast("double"), 2).alias("revenue"),
        )
        .orderBy("n_name")
    )


def _q03_topk_orders(spark, sf):
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .limit(10)
    )


def _q04_freq_priority(spark, sf):
    """Frequency table + the label CASE-map (former q17, merged in round 4
    to free a 50-slot registry entry for the round-4 capstones)."""
    o = _t(spark, sf, "orders")
    lab = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .when(F.col("o_orderpriority") == "2-HIGH", "high")
        .when(F.col("o_orderpriority").rlike("LOW"), "low")
        .otherwise("normal")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("label", lab)
        .select("o_orderpriority", "label", "cnt")
        .orderBy("o_orderpriority")
    )


def _q56_duration_batches(spark, sf):
    """Duration-bucketed training-batch assembly (operators/batching.py)
    driven over the documents table with text length as the duration —
    the token-length bucketing of an LLM pipeline, same operator as the
    audio dur_ms path. Whole assignment is one shuffle (plan-audited in
    tests/test_batching.py); the oracle replays bucket/shard/sequence/
    batch-stat exactly in SQL."""
    from semantic_log_detector_spark.operators.batching import duration_batches

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.length("text").cast("long").alias("len_chars"),
    )
    return duration_batches(
        d, id_col="doc_id", dur_col="len_chars", batch_size=16,
        boundaries=(200, 400, 800, 1600), num_shards=8,
    ).orderBy("doc_id")


def _q07_set_ops(spark, sf):
    """Set-operations rung in one slot: UNION ALL of two sources with
    provenance tags, per-key DISTINCT-source count and member count
    (subsumes the former q06 countDistinct and q07 union+distinct,
    merged in round 4 to free 50-slot registry entries)."""
    c, s = _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    u = c.select(F.col("c_nationkey").alias("nationkey"), F.lit("c").alias("src")).union(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("s").alias("src"))
    )
    return (
        u.groupBy("nationkey")
        .agg(
            F.countDistinct("src").alias("n_sources"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .orderBy("nationkey")
    )


def _q08_window_scalars(spark, sf):
    """Per-event window scalars in one pass: the 5-row sliding mean/count
    (former q08 sliding_avg) and the 10-row z-score-capped adjustment
    (former q12 zscore_window) — merged in round 5 to free a 50-slot
    registry slot for the vocab-drift promotion. Both windows share one
    (user_id, ts, event_id) partitioning+ordering, so the merged query
    sorts once where the two slots sorted twice."""
    e = _t(spark, sf, "events")
    w5 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    w10 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    mean = F.avg("value").over(w10)
    std = F.stddev_samp("value").over(w10)
    z = F.when(std > 0, (F.col("value") - mean) / std).otherwise(F.lit(0.0))
    factor = F.least(F.greatest(F.lit(1.0) + z / 3.0, F.lit(0.5)), F.lit(2.0))
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w5), 6).alias("avg5"),
        F.count(F.lit(1)).over(w5).alias("n_window"),
        F.round(F.col("value") * factor, 6).alias("adjusted"),
    )


def _q09_event_scalars(spark, sf):
    """W4 burst detector + W3 recency decay + W8 temporal features in one
    per-event scalar pass (subsumes the former q09 burst_flag, q10 decay
    and q11 temporal_features — merged in round 5 to free 50-slot registry
    entries for the promoted anomaly-explain and pitch oracles). One
    window spec family, one broadcast-1-row crossJoin for max(ts); each
    retired query's operator remains oracled inside this slot."""
    e = _t(spark, sf, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m_recent = F.avg("value").over(base.rowsBetween(-4, 0))
    m_rest = F.avg("value").over(base.rowsBetween(-19, -5))
    mx = e.agg(F.max("ts").alias("mx"))
    return (
        e.crossJoin(F.broadcast(mx))
        .select(
            "event_id",
            (m_rest.isNotNull() & (m_rest > 0) & (m_recent > 1.5 * m_rest)).alias("burst"),
            F.round(
                F.col("value")
                * F.greatest(
                    F.pow(
                        F.lit(0.95),
                        (F.col("mx").cast("timestamp").cast("double")
                         - F.col("ts").cast("timestamp").cast("double")) / 3600.0,
                    ),
                    F.lit(0.1),
                ),
                6,
            ).alias("decayed"),
            F.round(F.hour("ts") / 23.0, 6).alias("hour_norm"),
            F.round(((F.dayofweek("ts") + 5) % 7) / 6.0, 6).alias("dow_norm"),
            # + 0.0 canonicalizes IEEE -0.0 to 0.0 (cos at hour 6/18 rounds to
            # a signed zero in DuckDB but not Spark — bit-level hash divergence)
            (F.round(F.sin(2 * 3.141592653589793 * F.hour("ts") / 24.0), 6) + 0.0).alias("hour_sin"),
            (F.round(F.cos(2 * 3.141592653589793 * F.hour("ts") / 24.0), 6) + 0.0).alias("hour_cos"),
        )
    )


def _q13_window_alerts(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.floor(F.col("ts").cast("timestamp").cast("double") / 3600).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .orderBy("user_id", "bucket")
    )


def _q14_severity(spark, sf):
    e = _t(spark, sf, "events")
    score = F.col("value") / 490.02
    sev = (
        F.when(score >= 0.9, "Critical")
        .when(score >= 0.7, "High")
        .when(score >= 0.5, "Medium")
        .otherwise("Low")
    )
    return e.groupBy(sev.alias("severity")).agg(F.count(F.lit(1)).alias("cnt")).orderBy("severity")


def _q15_doc_scalars(spark, sf):
    """Per-document scalar-function suite in ONE projection pass:
    normalization chain (F3), stable row id (F4) and rolling-hash
    fingerprint (former q16/q26, merged here in round 4 so the 50-slot
    driver registry covers packing/audio-dedup). ``fingerprint`` is null
    for docs with fewer than 3 tokens (the former q26 filter, recast as a
    CASE so the row set stays one-per-doc)."""
    d = _t(spark, sf, "documents")
    out = F.regexp_replace(F.col("text"), r"\b\d+\b", "<NUM>")
    out = F.regexp_replace(out, r"\s+", " ")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    return d.select(
        "doc_id",
        F.substring(F.lower(F.trim(out)), 1, 128).alias("norm"),
        F.substring(F.md5(F.concat_ws("\x1f", "text", "lang")), 1, 12).alias("row_id"),
        F.when(F.size(toks) >= 3, F.array_min(F.transform(sh, F.md5))).alias(
            "fingerprint"
        ),
    )


def _q18_threshold_metrics(spark, sf):
    """Model-eval metrics in one row: confusion cells + derived metrics at
    the fixed 50.0 threshold (former q18 confusion) CROSS JOINed with the
    ROC-sweep F1 argmax (former q19 best_threshold) — merged in round 5 to
    free a 50-slot registry slot for the LM-perplexity promotion. Both
    sides are single-row aggregates, so the join is a broadcast of one
    row; each retired slot's operator is fully oracled here."""
    e = _t(spark, sf, "events")
    y = (F.col("event_type") == "error").cast("int")
    p = (F.col("value") > 50.0).cast("int")
    cells = e.agg(
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp") / (F.col("tp") + F.col("fn"))
    fixed = cells.select(
        "tp", "fp", "fn", "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(2 * prec * rec / (prec + rec), 6).alias("f1"),
        F.round((F.col("tp") + F.col("tn")) / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")), 6).alias("accuracy"),
    )
    by_v = (
        e.select(F.round("value", 0).alias("v"), (F.col("event_type") == "error").cast("long").alias("y"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("npos"))
    )
    tot = e.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("pos_all"),
    )
    w = Window.orderBy(F.desc("v")).rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        by_v.withColumn("cum_n", F.sum("n").over(w))
        .withColumn("cum_pos", F.sum("npos").over(w))
        .crossJoin(F.broadcast(tot))
    )
    tp = F.col("cum_pos")
    fp = F.col("cum_n") - tp
    fn = F.col("pos_all") - tp
    f1 = 2 * tp / (2 * tp + fp + fn)
    best = (
        scored.select(F.col("v").alias("best_threshold"),
                      F.round(f1, 6).alias("best_f1"))
        .orderBy(F.desc("best_f1"), F.asc("best_threshold"))
        .limit(1)
    )
    return fixed.crossJoin(F.broadcast(best))


def _q20_percentile_filter(spark, sf):
    e = _t(spark, sf, "events")
    thr = e.agg(F.expr("percentile(value, 0.95)").alias("thr"))
    return (
        e.crossJoin(F.broadcast(thr))
        .filter(F.col("value") >= F.col("thr"))
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.min("value"), 6).alias("min_above"),
            F.round(F.max("value"), 6).alias("max_above"),
        )
    )


def _q21_exact_dup_docs(spark, sf):
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.dedup import exact_dedup

    return exact_dedup(d, ["text"], "doc_id").select(
        "content_hash", "n_dups", "keep_id"
    ).orderBy("content_hash")


def _q22_ngram_jaccard(spark, sf):
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.dedup import ngram_jaccard_pairs

    # max_df=None: the oracle computes Jaccard over the UNFILTERED shingle
    # universe, so the stop-shingle guard must be off for the exact baseline
    # (at larger corpora a df>max_df shingle would otherwise diverge)
    return ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.03, max_df=None
    ).orderBy("id_a", "id_b")


def _q23_embedding_topk(spark, sf):
    emb = _t(spark, sf, "embeddings")
    from semantic_log_detector_spark.operators.knn import brute_force_topk

    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    b = emb.select(F.col("vec_id").alias("b_id"), "embedding")
    return brute_force_topk(q, b, k=5, metric="cosine").orderBy("q_id", "rank")


def _q24_embedding_profile(spark, sf):
    """Embedding-distribution profile in one slot: per-label norm stats
    (former q24) UNION per-dimension stats (former q38), tagged by a
    ``grp`` key — merged in round 4 to free a 50-slot registry entry."""
    emb = _t(spark, sf, "embeddings")
    from semantic_log_detector_spark.operators.knn import dim_stats, norm_stats

    a = norm_stats(emb, "label").select(
        F.concat(F.lit("label:"), F.col("label")).alias("grp"),
        "n",
        F.col("norm_mean").alias("mean"),
        F.col("norm_std").alias("std"),
        F.col("norm_min").alias("mn"),
        F.col("norm_max").alias("mx"),
    )
    b = dim_stats(emb).select(
        F.concat(
            F.lit("dim:"), F.lpad(F.col("dim").cast("string"), 2, "0")
        ).alias("grp"),
        "n", "mean", "std", "mn", "mx",
    )
    return a.unionByName(b).orderBy("grp")


def _q25_textstats(spark, sf):
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.textstats import (
        lang_id,
        quality_score,
        token_count,
    )

    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        lang_id(F.col("text")).alias("lang_guess"),
    )


def _q27_psi_split(spark, sf):
    e = _t(spark, sf, "events")
    nb, lo, hi = 20, 0.0, 500.0
    bin_col = F.least(
        F.greatest(F.floor((F.col("value") - lo) / ((hi - lo) / nb)), F.lit(0)), F.lit(nb - 1)
    ).alias("bin")
    side = F.when(F.dayofmonth("ts") <= 15, "a").otherwise("b").alias("side")
    counts = e.select(bin_col, side).groupBy("bin", "side").agg(F.count(F.lit(1)).alias("c"))
    grid = spark.range(nb).select(F.col("id").alias("bin"))
    a = counts.filter(F.col("side") == "a").select("bin", F.col("c").alias("ca"))
    b = counts.filter(F.col("side") == "b").select("bin", F.col("c").alias("cb"))
    j = grid.join(a, "bin", "left").join(b, "bin", "left").fillna(0)
    tot = j.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    jj = j.crossJoin(F.broadcast(tot))
    p = (F.col("ca") + 0.5) / (F.col("ta") + 0.5 * nb)
    q = (F.col("cb") + 0.5) / (F.col("tb") + 0.5 * nb)
    return jj.agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))


def _q28_stats_profile(spark, sf):
    l = _t(spark, sf, "lineitem")
    out = None
    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        # exact decimal sums make mean/std independent of summation order
        s = F.sum(F.col(c).cast("decimal(30,12)")).cast("double")
        # square in double (IEEE, order-free per value), then exact decimal sum
        s2 = F.sum((F.col(c) * F.col(c)).cast("decimal(30,10)")).cast("double")
        nn = F.count(c)
        var = (s2 - s * s / nn) / (nn - 1)
        row = l.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("cnt"),
            nn.alias("n_nonnull"),
            F.round(s / nn, 6).alias("mean"),
            F.round(F.sqrt(var), 6).alias("std"),
            F.round(F.min(c), 6).alias("mn"),
            F.round(F.max(c), 6).alias("mx"),
            # quantile triple absorbed from the former q05 slot (round 4):
            # A4's exact interpolated percentiles on the LOW-cardinality
            # columns only — exact percentile on l_extendedprice (~1 value
            # per row) builds a full counts map and costs ~8 s at sf0.1
            # (measured), and the high-cardinality exact-percentile rung
            # is already driver-oracled by q20_percentile_filter
            *(
                (
                    F.round(F.expr(f"percentile({c}, 0.25)"), 6).alias("q25"),
                    F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias("median"),
                    F.round(F.expr(f"percentile({c}, 0.75)"), 6).alias("q75"),
                )
                if c != "l_extendedprice"
                else (
                    F.lit(None).cast("double").alias("q25"),
                    F.lit(None).cast("double").alias("median"),
                    F.lit(None).cast("double").alias("q75"),
                )
            ),
            F.sum((F.col(c) == 0).cast("long")).alias("num_zeros"),
            F.countDistinct(c).alias("num_unique"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("col_name")


def _q29_orders_without_lineitem(spark, sf):
    o, l = _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    return (
        o.join(l.select("l_orderkey").distinct(), o["o_orderkey"] == F.col("l_orderkey"), "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    )


def _q30_dim_lookup(spark, sf):
    e = _t(spark, sf, "events")
    mapping = [
        ("error", "TA0040", "Impact"),
        ("signup", "TA0001", "Initial Access"),
        ("purchase", "TA0010", "Exfiltration"),
    ]
    dim = e.sparkSession.createDataFrame(mapping, ["event_type", "technique", "tactic"])
    return (
        e.join(F.broadcast(dim), "event_type", "left")
        .groupBy(
            F.coalesce("technique", F.lit("unknown")).alias("technique"),
            F.coalesce("tactic", F.lit("unknown")).alias("tactic"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("technique")
    )


def _q31_semi_blocklist(spark, sf):
    e = _t(spark, sf, "events")
    bl = e.sparkSession.createDataFrame([(1,), (2,), (3,), (5,), (8,)], ["user_id"])
    return (
        e.join(F.broadcast(bl), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("user_id")
    )


def _q32_topk_per_group(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", F.round("value", 6).alias("value"))
        .orderBy("event_type", "rank")
    )


# ------------------------------------- approximate ladder, machine-checked


def _q33_minhash_pairs(spark, sf):
    """MinHash-LSH near-dup validation against the exact baseline: output
    is the exact Jaccard pair set at the threshold, full-outer-joined with
    the LSH pairs and annotated `lsh_found`. The DuckDB oracle produces the
    exact pairs with lsh_found=TRUE, so an LSH miss flips a boolean (hash
    mismatch) and an LSH false positive adds a row (rowcount mismatch) —
    recall AND precision are machine-checked, per the subset-of-exact
    scheme."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    exact = ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.2, max_df=None
    )
    lsh = minhash_lsh_pairs(d, "text", "doc_id", jaccard_threshold=0.2).withColumn(
        "found", F.lit(True)
    )
    return (
        exact.alias("e")
        .join(lsh.alias("l"), ["id_a", "id_b"], "full")
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("e.jaccard"), F.col("l.jaccard")).alias("jaccard"),
            F.coalesce("found", F.lit(False)).alias("lsh_found"),
        )
    )


def _q34_simhash_pairs(spark, sf):
    """Exact-complete Hamming-≤3 pair search over the md5-60-bit SimHash
    (4-band pigeonhole ⇒ no LSH miss); the oracle recomputes the simhash
    bit-for-bit in SQL."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(d, "text", "doc_id", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _q35_lsh_topk(spark, sf):
    """Hyperplane-LSH approximate top-k. The hyperplanes are deterministic
    seeded literals, so the oracle replicates the WHOLE algorithm —
    signatures, bucket join, exact in-bucket cosine ranking — bit-for-bit
    in SQL (see _lsh_topk_oracle)."""
    emb = _t(spark, sf, "embeddings")
    from semantic_log_detector_spark.operators.knn import lsh_topk

    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    b = emb.select(F.col("vec_id").alias("b_id"), "embedding")
    return lsh_topk(q, b, k=5, dim=64)


def _tree_export_path(tag: str) -> str:
    """Oracle side-channel path for a synthesized fixture, keyed on a hash
    of this file plus the fixture-generating sources. Each export is
    rewritten (atomic replace) by the query before the oracle reads it, so
    within one tree the content is always current; the hash key closes the
    cross-TREE hazard (round-4 verdict "what's wrong" #1, fixed for the
    pitch export in round 5 and generalized here): two concurrent harness
    runs of *different* trees — where the fixture generators differ — land
    on different paths and can never read each other's exports, and a
    stale file from an aborted run of an older tree is unreachable."""
    import hashlib
    from pathlib import Path

    pkg = Path(__file__).resolve().parent / "semantic_log_detector_spark"
    h = hashlib.md5()
    for p in (
        Path(__file__).resolve(),
        pkg / "sources" / "synth.py",
        pkg / "operators" / "segment.py",
        pkg / "functions" / "audio.py",
        pkg / "functions" / "g711.py",
    ):
        h.update(p.read_bytes())
    return f"/tmp/sldspark_oracle_{tag}_{h.hexdigest()[:12]}.parquet"


_Q36_EXPORT = _tree_export_path("q36_clips_4000")


def _q36_clips_suite(spark, sf):
    """Clip row-rule suite → per-(partition, rule) verdicts.

    The input is the deterministic synthetic clips table (metadata only),
    not a driver parquet table — so for the DuckDB oracle the meta rows are
    exported to a tree-keyed path at construction time. Content is a pure
    function of (n=4000, seed=42) within one tree: overwriting is
    idempotent, a same-tree stale file is byte-identical, and a different
    tree lands on a different path (_tree_export_path), so Spark/oracle
    ordering can never skew the comparison."""
    import os

    from semantic_log_detector_spark.checks.base import RunContext
    from semantic_log_detector_spark.checks.row_rules import default_clip_rules, run_row_rules
    from semantic_log_detector_spark.sources.synth import clips_table

    clips = clips_table(spark, 4000, with_bytes=False)
    pdf = clips.select("clip_id", "part_id", "sr_hz", "dur_ms", "codec", "transcript").toPandas()
    tmp = f"{_Q36_EXPORT}.{os.getpid()}.tmp"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, _Q36_EXPORT)  # atomic: concurrent drivers never see a torn file
    res = run_row_rules(clips, default_clip_rules(), RunContext(run_id="entry"))
    return res.verdicts.orderBy("part_id", "rule_id").drop("run_id")


def _q37_media_features(spark, sf):
    """Multimodal plumbing (X2/X3): opaque binary payloads → mapInPandas
    feature extraction. Payloads are the documents' utf-8 bytes so the
    deterministic fake feature (sha256-derived) is DuckDB-reproducible:
    this oracles the full Arrow-batch decode seam end-to-end. Features are
    exploded to (feat_idx, feat_value) rows — hashable for the harness."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.multimodal import extract_media_features

    kind = F.element_at(
        F.array(F.lit("image"), F.lit("video"), F.lit("audio")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = extract_media_features(media)
    return feats.select(
        "media_id",
        "kind",
        "ok",
        "real",
        F.posexplode("features").alias("feat_idx", "feat_value"),
    ).select(
        "media_id",
        "kind",
        "ok",
        "real",
        F.col("feat_idx").cast("long").alias("feat_idx"),
        (F.round("feat_value", 6) + 0.0).alias("feat_value"),
    )


def _q39_embedding_dups(spark, sf):
    """Embedding-cosine near-dup pairs (dedup ladder, LSH-bucketed candidate
    generation + exact cosine filter). Deterministic seeded hyperplanes →
    the oracle replicates buckets + cosine filter bit-for-bit in SQL."""
    emb = _t(spark, sf, "embeddings")
    from semantic_log_detector_spark.operators.knn import embedding_dup_pairs

    return embedding_dup_pairs(emb, threshold=0.35, dim=64, n_planes=6, n_tables=6)


def _q40_dup_clusters(spark, sf):
    """Connected components over the exact near-dup pair graph (q22 params)
    → duplicate clusters with canonical keep ids. The DuckDB oracle walks
    the same graph with a recursive CTE, so cluster membership, sizes and
    canonicals are all machine-checked."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.dedup import (
        dup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.03, max_df=None
    )
    return dup_clusters(pairs).orderBy("id")


def _q41_ivf_topk(spark, sf):
    """IVF top-k at full probe (nprobe == n_cells): the partition-pruned
    search must degrade EXACTLY to brute force regardless of the learned
    centroids, so the oracle is the exact cosine top-k in SQL — this
    machine-checks the cell-assignment + probe plumbing end-to-end."""
    emb = _t(spark, sf, "embeddings")
    from semantic_log_detector_spark.operators.knn import ivf_topk

    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    b = emb.select(F.col("vec_id").alias("b_id"), "embedding")
    return ivf_topk(q, b, k=5, n_cells=8, nprobe=8)


def _q42_stratified_split(spark, sf):
    """Deterministic hash split (md5-bucket) × language stratification
    audit: per-(split, lang) counts. The oracle recomputes the md5 bucket
    bit-for-bit in SQL."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.splits import hash_split

    split = hash_split(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1})
    return (
        d.groupBy(split.alias("split"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "lang")
    )


def _q43_training_selection(spark, sf):
    """Capstone: the end-to-end training-set curation pass — near-dup
    canonicalization (exact pair graph, q22/q40 params) + language filter +
    quality floor, reduced to the one-row token accounting a data-mixing
    decision reads. The oracle composes the q25 stats SQL with the q40
    recursive cluster walk."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.curate import (
        curate_documents,
        curation_summary,
    )

    kept = curate_documents(
        d, langs=("en",), min_quality=0.5, jaccard_threshold=0.03,
        exact_pairs=True, max_df=None,
    )
    return curation_summary(kept)


def _q44_decontamination(spark, sf):
    """Benchmark decontamination (training-data pipeline extra): corpus
    docs containing ≥80% of a benchmark doc's shingles. The benchmark is
    drawn from the corpus itself (doc_id < 15), so every benchmark item
    flags at least its own corpus copy — a planted known answer. Scale
    shape: benchmark postings broadcast, corpus scanned once."""
    d = _t(spark, sf, "documents")
    from semantic_log_detector_spark.operators.dedup import contamination_pairs

    bench = d.filter(F.col("doc_id") < 15)
    return contamination_pairs(
        d, bench, "text", "doc_id", shingle_n=3, min_containment=0.8
    ).orderBy("doc_id", "bench_id")


def _q45_asof_join(spark, sf):
    """As-of join (operator Spark lacks natively): every 'error' event
    paired with the user's most recent 'click' at-or-before it. Union +
    last(ignorenulls) window — ONE shuffle on user_id, no inequality
    join, no nested loop (operators/temporal_join.py::asof_join). Oracle:
    DuckDB's native ASOF JOIN. Right side pre-deduped per (user, ts) by
    max event_id so the at-equal-ts tie-break is well-defined on both
    engines."""
    from semantic_log_detector_spark.operators.temporal_join import asof_join

    e = _t(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(
        errors, clicks,
        key_cols=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["click_event_id"], direction="backward", suffix="",
    )
    return out.select(
        "event_id", "user_id", F.col("click_event_id").alias("last_click_id")
    ).orderBy("event_id")


def _q46_range_join(spark, sf):
    """Interval range join without a nested loop: for each 'error' event,
    how many 'click' events by the same user landed in the 10 minutes
    up to it. Anchors (errors) explode to the time cells their window
    overlaps, probes (clicks) land in exactly one cell, Catalyst hash-
    joins on (user_id, cell) and the exact BETWEEN filters after
    (operators/temporal_join.py::range_interval_join). Left-join
    semantics: zero-click errors surface with n_clicks=0."""
    from semantic_log_detector_spark.operators.temporal_join import (
        range_interval_join,
    )

    e = _t(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("lo"),
        F.col("ts").alias("hi"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    matched = range_interval_join(
        clicks, errors, key_cols=["user_id"], probe_ts="ts",
        anchor_lo="lo", anchor_hi="hi", bucket_s=600,
    )
    counts = matched.groupBy("err_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return (
        errors.select("err_id", "user_id")
        .join(counts, "err_id", "left")
        .select(
            "err_id", "user_id",
            F.coalesce("n_clicks", F.lit(0)).cast("long").alias("n_clicks"),
        )
        .orderBy("err_id")
    )


def _q47_sessionize(spark, sf):
    """Gap-based sessionization (batch twin of the streaming session
    window): sessions split at >30 min of user inactivity; per-session
    aggregates. lag + running sum share one window partitioning → a
    single exchange on user_id
    (operators/temporal_join.py::sessionize)."""
    from semantic_log_detector_spark.operators.temporal_join import sessionize

    e = _t(spark, sf, "events")
    s = sessionize(e, ["user_id"], "ts", gap_s=1800)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def _q48_vocab_topk(spark, sf):
    """Exact corpus vocabulary heavy hitters: top-50 tokens by occurrence
    count with document frequency — one explode + two-phase aggregate,
    TakeOrdered top-k (operators/textstats.py::token_frequencies)."""
    from semantic_log_detector_spark.operators.textstats import token_frequencies

    d = _t(spark, sf, "documents")
    return (
        token_frequencies(d)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(50)
    )


def _q49_token_budget_sample(spark, sf):
    """Deterministic per-source token-budget mixture sampling (data
    mixing): keep ≈800 tokens per source via the broadcast-totals +
    md5-bucket filter (operators/splits.py::token_budget_sample — no
    per-source sort, the 100 TB shape); audited per source."""
    from semantic_log_detector_spark.operators.splits import token_budget_sample

    d = _t(spark, sf, "documents")
    kept = token_budget_sample(d, budget_tokens=800)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .orderBy("source")
    )


def _q50_repetition(spark, sf):
    """Gopher-style per-doc repetition quality signals: duplicate-bigram
    occurrence fraction + top-bigram share (ties to the lexicographically
    smallest gram) — two partial-aggregated groupBys, doc spine preserved
    (operators/textstats.py::repetition_stats)."""
    from semantic_log_detector_spark.operators.textstats import repetition_stats

    d = _t(spark, sf, "documents")
    return repetition_stats(d).orderBy("id")


def _q51_pack_sequences(spark, sf):
    """Deterministic sequence packing: greedy first-fit of documents into
    64-token context windows within 8 md5 hash buckets — assignment is a
    pure function of the id set, the only shuffle is one hash partition
    on the bucket key (operators/packing.py::pack_sequences). context=64
    at this scale so both branches (multi-doc windows and oversize
    single-doc windows) are exercised and oracled."""
    from semantic_log_detector_spark.operators.packing import pack_sequences

    d = _t(spark, sf, "documents")
    return pack_sequences(d, context_tokens=64, num_buckets=8).orderBy(
        "bucket", "window_idx", "pos_in_window"
    )


_Q52_EXPORT = _tree_export_path("q52_dup_audio_600")


def _q52_audio_dup(spark, sf):
    """Acoustic content-dup detection against planted ground truth: 600
    synthetic melody clips, ~40% of odd rows duplicating their neighbor's
    CONTENT under a different real codec, different noise and an
    independently drawn sample rate (sources/synth.py::content_dup_clips).
    The detector must be codec- AND rate-invariant to recover them. The detector (60-bit melody
    fingerprint + exact Hamming-≤3 pigeonhole join,
    operators/audio_dedup.py) must recover exactly the planted pair set:
    the oracle replays the planted pairs with found=TRUE from the export,
    so a missed pair flips the hash and a false-positive pair changes the
    rowcount — recall AND precision machine-checked, per the q33 scheme."""
    import os

    from semantic_log_detector_spark.operators.audio_dedup import audio_dup_pairs
    from semantic_log_detector_spark.sources.synth import content_dup_clips

    clips = content_dup_clips(spark, 600, seed=7)
    truth = (
        clips.filter("is_dup")
        .select(
            F.col("src_clip_id").alias("id_a"), F.col("clip_id").alias("id_b")
        )
        .toPandas()
        .sort_values(["id_a", "id_b"])
    )
    tmp = f"{_Q52_EXPORT}.{os.getpid()}.tmp"
    truth.to_parquet(tmp, index=False)
    os.replace(tmp, _Q52_EXPORT)  # atomic, idempotent: pure fn of (n, seed)
    found = audio_dup_pairs(clips).withColumn("f", F.lit(True))
    expected = spark.createDataFrame(truth)
    return (
        expected.alias("e")
        .join(found.alias("d"), ["id_a", "id_b"], "full")
        .select(
            "id_a", "id_b", F.coalesce("f", F.lit(False)).alias("found")
        )
        .orderBy("id_a", "id_b")
    )


_Q53_EXPORT = _tree_export_path("q53_bimodal_400")


def _q53_crossmodal_dup(spark, sf):
    """Cross-modal duplicate pairs (operators/crossmodal.py) with a fully
    RECOMPUTING oracle: 400 planted content-dup clips get deterministic
    transcripts where groups of 7 share the exact text, so duplicates hide
    in BOTH modalities. The per-clip (fp, fake, transcript) table is
    exported; DuckDB then independently recomputes the text rung end to
    end (the q34 SimHash twin over the raw transcripts), re-derives the
    audio rung from the fingerprints with bit_count(xor) <= 3, and replays
    the union + per-pair modality-flag aggregation — so the pigeonhole
    join's completeness, the modality union, and the flag agg are all
    machine-checked, not just replayed from a planted answer key."""
    import os

    from semantic_log_detector_spark.operators.audio_dedup import audio_fingerprint
    from semantic_log_detector_spark.operators.crossmodal import (
        cross_modal_dup_pairs,
    )
    from semantic_log_detector_spark.sources.synth import content_dup_clips

    base = content_dup_clips(spark, 400, seed=13)
    grp = F.floor(F.col("idx") / F.lit(7)).cast("long").cast("string")
    clips = base.withColumn(
        "transcript",
        F.concat_ws(
            " ",
            F.lit("grp"), grp,
            F.substring(F.md5(grp), 1, 8),
            F.substring(F.md5(F.concat(grp, F.lit("x"))), 1, 8),
            F.lit("shared filler words common to every clip"),
        ),
    )
    pdf = (
        audio_fingerprint(clips, passthrough=("transcript",))
        .toPandas()
        .sort_values("id")
    )
    tmp = f"{_Q53_EXPORT}.{os.getpid()}.tmp"
    pdf.to_parquet(tmp, index=False)
    os.replace(tmp, _Q53_EXPORT)  # atomic, idempotent: pure fn of (n, seed)
    return cross_modal_dup_pairs(
        clips.select("clip_id", "bytes", "codec"),
        clips.select("clip_id", "transcript"),
    ).orderBy("id_a", "id_b")


_Q54_EXPORT = _tree_export_path("q54_segments_400")


def _q54_speech_segments(spark, sf):
    """Energy-VAD speech segmentation (operators/segment.py) against a
    single-process reference: 400 planted burst clips
    (sources/synth.py::burst_clips) restricted to the bit-exact codecs
    (pcm_s16le WAV + the pure-numpy FLAC: int16 round-trip is lossless),
    so the distributed decode must reproduce the local reference EXACTLY
    — segment boundaries, durations and mean frame dB to the rounded
    digit. The oracle replays segments computed locally over the
    re-synthesized, int16-quantized signal; what the comparison
    machine-checks is the distributed path: codec round-trip, Arrow
    batching, mapInPandas schema, and the segment/rounding arithmetic."""
    import os

    import numpy as np
    import pandas as pd

    from semantic_log_detector_spark.operators.segment import (
        DEFAULT_THRESHOLD_DBFS, FRAME_MS, HOP_MS,
        _frame_rms_db, _segments_from_mask, speech_segments,
    )
    from semantic_log_detector_spark.sources.synth import _stream, burst_clips

    n, seed, sr = 400, 5, 16000
    clips = burst_clips(spark, n, seed=seed).filter(F.col("codec") != "mulaw")

    # local reference: mirror burst_clips' signal arithmetic (same hash
    # streams, same float ops) + encode_wav/encode_flac's shared int16
    # quantization, then run the same kernel single-process.
    i = np.arange(n, dtype=np.int64)
    n_bursts = 1 + (_stream(i, 70, seed) % np.uint64(3)).astype(int)
    codec_i = (_stream(i, 71, seed) % np.uint64(3)).astype(int)
    jit = (_stream(i, 72, seed) % np.uint64(8)).astype(int) * 0.01
    freq = 440.0 + 40.0 * (_stream(i, 73, seed) % np.uint64(12)).astype(int)
    base_sched = [(0.3, 0.8), (1.4, 1.9), (2.3, 2.7)]
    t = np.arange(3 * sr, dtype=np.float64) / sr
    frame_s, hop_s = FRAME_MS / 1000.0, HOP_MS / 1000.0
    rows = []
    for r in range(n):
        if codec_i[r] == 2:  # mulaw rotates third; excluded above (lossy)
            continue
        sig = np.zeros(3 * sr)
        for k in range(int(n_bursts[r])):
            t0 = base_sched[k][0] + float(jit[r])
            t1 = base_sched[k][1] + float(jit[r])
            s0, s1 = int(t0 * sr), int(t1 * sr)
            sig[s0:s1] = 0.5 * np.sin(2 * np.pi * freq[r] * t[s0:s1])
        ints = np.clip(
            sig.astype(np.float32).astype(np.float64) * 32767.0, -32768, 32767
        ).astype("<i2")
        pcm = ints.astype(np.float32) / 32767.0
        db = _frame_rms_db(np.asarray(pcm, dtype=np.float64), sr, FRAME_MS, HOP_MS)
        segs = _segments_from_mask(
            db >= DEFAULT_THRESHOLD_DBFS, hop_s, frame_s, 0.1, 0.15
        )
        dur_total = len(pcm) / float(sr)
        for k2, (a, b) in enumerate(segs):
            b = min(b, dur_total)
            f0 = int(a / hop_s)
            f1 = max(f0 + 1, min(int(np.ceil(b / hop_s)), len(db)))
            ra, rb = round(a, 4), round(b, 4)
            rows.append({
                "clip_id": f"b{r:010d}",
                "seg_idx": k2,
                "start_s": ra,
                "end_s": rb,
                "dur_s": round(rb - ra, 4),
                "rms_db": round(float(np.mean(db[f0:f1])), 2),
            })
    exp = pd.DataFrame(rows)
    tmp = f"{_Q54_EXPORT}.{os.getpid()}.tmp"
    exp.to_parquet(tmp, index=False)
    os.replace(tmp, _Q54_EXPORT)  # atomic, idempotent: pure fn of (n, seed)
    return (
        speech_segments(clips)
        .select("clip_id", "seg_idx", "start_s", "end_s", "dur_s", "rms_db")
        .orderBy("clip_id", "seg_idx")
    )


_Q55_EXPORT = _tree_export_path("q55_snippets_300")


def _q55_snippet_search(spark, sf):
    """Landmark-voting snippet retrieval (operators/audio_search.py)
    against planted ground truth: 12 snippets cut from a 300-clip melody
    corpus at non-grid offsets, downsampled 16k->8k and re-encoded to
    G.711 mu-law (so retrieval must be rate- and codec-invariant), plus 3
    out-of-corpus negatives. The oracle replays the planted
    (query -> source clip) table with found/offset_ok TRUE: a missed
    positive flips found, a wrong clip changes the value, a drifted
    offset flips offset_ok, and a false positive on a negative query
    changes the rowcount — recall AND precision machine-checked, the q52
    scheme."""
    import os

    import numpy as np
    import pandas as pd

    from semantic_log_detector_spark.functions.audio import (
        decode_clip, resample_linear,
    )
    from semantic_log_detector_spark.functions.g711 import encode_mulaw
    from semantic_log_detector_spark.operators.audio_search import (
        audio_snippet_search,
    )
    from semantic_log_detector_spark.sources.synth import melody_clips

    corpus = melody_clips(spark, 300, seed=11)
    picks = sorted(
        corpus.filter("idx % 17 = 3 AND idx < 204").collect(),
        key=lambda x: x["idx"],
    )  # exactly 12 deterministic rows: idx 3, 20, ..., 190
    qrows, truth = [], []
    for j, r in enumerate(picks):
        pcm, sr0 = decode_clip(bytes(r["bytes"]), r["codec"])
        off = 0.23 + 0.41 * (j % 7)
        s0 = int(off * sr0)
        piece = resample_linear(
            np.asarray(pcm[s0 : s0 + int(2.5 * sr0)], np.float64), sr0, 8000
        )
        qrows.append((f"q{j:02d}", encode_mulaw(piece.astype(np.float32), 8000),
                      "mulaw"))
        truth.append({"query_id": f"q{j:02d}", "clip_id": r["clip_id"],
                      "exp_offset": float(off)})
    for j, r in enumerate(melody_clips(spark, 3, seed=888).collect()):
        pcm, sr0 = decode_clip(bytes(r["bytes"]), r["codec"])
        piece = resample_linear(
            np.asarray(pcm[sr0 : 3 * sr0], np.float64), sr0, 8000
        )
        qrows.append((f"neg{j}", encode_mulaw(piece.astype(np.float32), 8000),
                      "mulaw"))
    exp_pdf = pd.DataFrame(truth)
    tmp = f"{_Q55_EXPORT}.{os.getpid()}.tmp"
    exp_pdf.to_parquet(tmp, index=False)
    os.replace(tmp, _Q55_EXPORT)  # atomic, idempotent: pure fn of the seeds
    qdf = spark.createDataFrame(qrows, "clip_id string, bytes binary, codec string")
    res = audio_snippet_search(corpus, qdf, top_k=1)
    exp = spark.createDataFrame(exp_pdf).select(
        "query_id",
        F.col("clip_id").alias("exp_clip"),
        "exp_offset",
    )
    return (
        exp.join(res, "query_id", "full")
        .select(
            "query_id",
            F.coalesce(F.col("clip_id"), F.lit("MISS")).alias("clip_id"),
            F.col("clip_id").isNotNull().alias("found"),
            F.coalesce(
                F.abs(F.col("offset_s") - F.col("exp_offset")) <= 0.25,
                F.lit(False),
            ).alias("offset_ok"),
        )
        .orderBy("query_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": _q01_pricing_summary,
        "q02_nation_revenue": _q02_nation_revenue,
        "q03_topk_orders": _q03_topk_orders,
        "q04_freq_priority": _q04_freq_priority,
        "q07_set_ops": _q07_set_ops,
        "q08_window_scalars": _q08_window_scalars,
        "q09_event_scalars": _q09_event_scalars,
        "q13_window_alerts": _q13_window_alerts,
        "q14_severity": _q14_severity,
        "q15_doc_scalars": _q15_doc_scalars,
        "q18_threshold_metrics": _q18_threshold_metrics,
        "q20_percentile_filter": _q20_percentile_filter,
        "q21_exact_dup_docs": _q21_exact_dup_docs,
        "q22_ngram_jaccard": _q22_ngram_jaccard,
        "q23_embedding_topk": _q23_embedding_topk,
        "q24_embedding_profile": _q24_embedding_profile,
        "q25_textstats": _q25_textstats,
        "q27_psi_split": _q27_psi_split,
        "q28_stats_profile": _q28_stats_profile,
        "q29_orders_without_lineitem": _q29_orders_without_lineitem,
        "q30_dim_lookup": _q30_dim_lookup,
        "q31_semi_blocklist": _q31_semi_blocklist,
        "q32_topk_per_group": _q32_topk_per_group,
        "q33_minhash_pairs": _q33_minhash_pairs,
        "q34_simhash_pairs": _q34_simhash_pairs,
        "q35_lsh_topk": _q35_lsh_topk,
        "q36_clips_suite": _q36_clips_suite,
        "q37_media_features": _q37_media_features,
        "q39_embedding_dups": _q39_embedding_dups,
        "q40_dup_clusters": _q40_dup_clusters,
        "q41_ivf_topk": _q41_ivf_topk,
        "q42_stratified_split": _q42_stratified_split,
        "q43_training_selection": _q43_training_selection,
        "q44_decontamination": _q44_decontamination,
        "q45_asof_join": _q45_asof_join,
        "q46_range_join": _q46_range_join,
        "q47_sessionize": _q47_sessionize,
        "q48_vocab_topk": _q48_vocab_topk,
        "q49_token_budget_sample": _q49_token_budget_sample,
        "q50_repetition": _q50_repetition,
        "q51_pack_sequences": _q51_pack_sequences,
        "q52_audio_dup": _q52_audio_dup,
        "q53_crossmodal_dup": _q53_crossmodal_dup,
        "q54_speech_segments": _q54_speech_segments,
        "q55_snippet_search": _q55_snippet_search,
        "q56_duration_batches": _q56_duration_batches,
        # round-5 promotions from the local-gate extras (xq01/xq04), into
        # the two slots freed by the q09/q10/q11 merge: the reference's
        # flagship anomaly-explain composite and the pitch-verdict suite
        # now carry hard driver-recorded correctness rows.
        "q57_anomaly_explain": _q57_anomaly_explain,
        "q58_pitch_verdicts": _q58_pitch_verdicts,
        # second round-5 promotion wave, into the slots freed by the
        # q08+q12 and q18+q19 merges: the last two local-gate extras
        # (vocab drift and the LM-perplexity filter) now also carry
        # driver-recorded rows — extra_queries() is empty.
        "q59_vocab_drift": _q59_vocab_drift,
        "q60_lm_perplexity": _q60_lm_perplexity,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity::DECIMAL(30,12))::DOUBLE, 2) AS sum_qty,
                   round(sum(l_extendedprice::DECIMAL(30,12))::DOUBLE, 2) AS sum_base_price,
                   round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(30,12))::DOUBLE, 2) AS sum_disc_price,
                   round(sum(l_quantity::DECIMAL(30,12))::DOUBLE / count(*), 6) AS avg_qty,
                   round(sum(l_extendedprice::DECIMAL(30,12))::DOUBLE / count(*), 6) AS avg_price,
                   round(sum(l_discount::DECIMAL(30,12))::DOUBLE / count(*), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q02_nation_revenue": """
            SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice::DECIMAL(30,12))::DOUBLE, 2) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY 1
        """,
        "q03_topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS total
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "q04_freq_priority": """
            SELECT o_orderpriority,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                        WHEN o_orderpriority = '2-HIGH' THEN 'high'
                        WHEN regexp_matches(o_orderpriority, 'LOW') THEN 'low'
                        ELSE 'normal' END AS label,
                   count(*) AS cnt
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "q07_set_ops": """
            SELECT nationkey, count(DISTINCT src) AS n_sources,
                   count(*) AS n_members
            FROM (SELECT c_nationkey AS nationkey, 'c' AS src FROM customer
                  UNION ALL
                  SELECT s_nationkey AS nationkey, 's' AS src FROM supplier)
            GROUP BY 1 ORDER BY 1
        """,
        "q08_window_scalars": """
            SELECT event_id, user_id,
                   round(avg(value) OVER w5, 6) AS avg5,
                   count(*) OVER w5 AS n_window,
                   round(value * least(greatest(1.0 + (CASE WHEN sd > 0 THEN (value - mn) / sd ELSE 0.0 END) / 3.0, 0.5), 2.0), 6) AS adjusted
            FROM (
              SELECT event_id, user_id, value, ts,
                     avg(value) OVER w10 AS mn,
                     stddev_samp(value) OVER w10 AS sd
              FROM events
              WINDOW w10 AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
            WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "q09_event_scalars": """
            SELECT event_id,
                   coalesce(mr IS NOT NULL AND mr > 0 AND mc > 1.5 * mr, FALSE) AS burst,
                   round(value * greatest(power(0.95, (epoch(mx) - epoch(ts)) / 3600.0), 0.1), 6) AS decayed,
                   round(hour(ts) / 23.0, 6) AS hour_norm,
                   round(((dayofweek(ts) + 6) % 7) / 6.0, 6) AS dow_norm,
                   round(sin(2 * 3.141592653589793 * hour(ts) / 24.0), 6) + 0.0 AS hour_sin,
                   round(cos(2 * 3.141592653589793 * hour(ts) / 24.0), 6) + 0.0 AS hour_cos
            FROM (
              SELECT event_id, value, ts,
                     avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mc,
                     avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 19 PRECEDING AND 5 PRECEDING) AS mr
              FROM events), (SELECT max(ts) AS mx FROM events)
        """,
        "q13_window_alerts": """
            SELECT user_id, floor(epoch(ts) / 3600)::BIGINT AS bucket, count(*) AS n
            FROM events WHERE event_type = 'error'
            GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2
        """,
        "q14_severity": """
            SELECT CASE WHEN value / 490.02 >= 0.9 THEN 'Critical'
                        WHEN value / 490.02 >= 0.7 THEN 'High'
                        WHEN value / 490.02 >= 0.5 THEN 'Medium'
                        ELSE 'Low' END AS severity,
                   count(*) AS cnt
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q15_doc_scalars": r"""
            WITH toks AS (
              SELECT doc_id, text, lang,
                     string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents)
            SELECT doc_id,
                   substring(lower(trim(regexp_replace(regexp_replace(text, '\b\d+\b', '<NUM>', 'g'), '\s+', ' ', 'g'))), 1, 128) AS norm,
                   substring(md5(concat(text, chr(31), lang)), 1, 12) AS row_id,
                   CASE WHEN len(t) >= 3
                        THEN list_min([md5(array_to_string(t[i:i+2], ' ')) FOR i IN range(1, len(t) - 1)])
                        END AS fingerprint
            FROM toks
        """,
        "q18_threshold_metrics": """
            WITH c AS (
              SELECT sum(CASE WHEN event_type = 'error' AND value > 50.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
                     sum(CASE WHEN event_type != 'error' AND value > 50.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
                     sum(CASE WHEN event_type = 'error' AND value <= 50.0 THEN 1 ELSE 0 END)::BIGINT AS fn,
                     sum(CASE WHEN event_type != 'error' AND value <= 50.0 THEN 1 ELSE 0 END)::BIGINT AS tn
              FROM events),
            by_v AS (
              SELECT round(value, 0) AS v, count(*) AS n,
                     sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS npos
              FROM events GROUP BY 1),
            tot AS (
              SELECT count(*) AS n_all,
                     sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS pos_all
              FROM events),
            scored AS (
              SELECT v,
                     sum(n) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                     sum(npos) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
              FROM by_v),
            best AS (
              SELECT v AS best_threshold,
                     round(2.0 * cum_pos / (2.0 * cum_pos + (cum_n - cum_pos) + (pos_all - cum_pos)), 6) AS best_f1
              FROM scored, tot
              ORDER BY best_f1 DESC, best_threshold ASC LIMIT 1)
            SELECT tp, fp, fn, tn,
                   round(tp / (tp + fp), 6) AS precision,
                   round(tp / (tp + fn), 6) AS recall,
                   round(2.0 * (tp / (tp + fp)) * (tp / (tp + fn)) / ((tp / (tp + fp)) + (tp / (tp + fn))), 6) AS f1,
                   round((tp + tn) / (tp + fp + fn + tn), 6) AS accuracy,
                   best_threshold, best_f1
            FROM c, best
        """,
        "q20_percentile_filter": """
            SELECT count(*) AS n_above,
                   round(min(value), 6) AS min_above,
                   round(max(value), 6) AS max_above
            FROM events, (SELECT quantile_cont(value, 0.95) AS thr FROM events)
            WHERE value >= thr
        """,
        "q21_exact_dup_docs": """
            SELECT md5(coalesce(text, '∅')) AS content_hash,
                   count(*) AS n_dups, min(doc_id) AS keep_id
            FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1
        """,
        "q22_ngram_jaccard": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
              FROM toks WHERE len(t) >= 3),
            inv AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b, round(inter / (na + nb - inter), 6) AS jaccard
            FROM pairs WHERE round(inter / (na + nb - inter), 6) >= 0.03
            ORDER BY id_a, id_b
        """,
        "q23_embedding_topk": """
            SELECT q_id, b_id, score, rank FROM (
              SELECT q.vec_id AS q_id, b.vec_id AS b_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                                                 b.vec_id ASC) AS rank
              FROM embeddings q JOIN embeddings b ON q.vec_id != b.vec_id
              WHERE q.vec_id < 10)
            WHERE rank <= 5 ORDER BY q_id, rank
        """,
        "q24_embedding_profile": """
            SELECT grp, n, mean, std, mn, mx FROM (
              SELECT 'label:' || label AS grp, count(*) AS n,
                     round(avg(nrm), 6) AS mean,
                     round(stddev_samp(nrm), 6) AS std,
                     round(min(nrm), 6) AS mn,
                     round(max(nrm), 6) AS mx
              FROM (SELECT label, sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
                    FROM embeddings)
              GROUP BY 1
              UNION ALL
              SELECT 'dim:' || lpad(CAST(i AS VARCHAR), 2, '0') AS grp,
                     count(*) AS n,
                     round(sum(v::DECIMAL(30,12))::DOUBLE / count(*), 6) + 0.0 AS mean,
                     round(sqrt((sum((v * v)::DECIMAL(30,10))::DOUBLE
                                 - sum(v::DECIMAL(30,12))::DOUBLE
                                   * sum(v::DECIMAL(30,12))::DOUBLE / count(*))
                                / (count(*) - 1)), 6) + 0.0 AS std,
                     round(min(v), 6) + 0.0 AS mn,
                     round(max(v), 6) + 0.0 AS mx
              FROM (SELECT i, embedding[i + 1]::DOUBLE AS v
                    FROM embeddings, range(64) t(i))
              GROUP BY 1
            ) ORDER BY grp
        """,
        "q27_psi_split": """
            WITH binned AS (
              SELECT least(greatest(floor(value / 25.0), 0), 19)::BIGINT AS bin,
                     CASE WHEN dayofmonth(ts) <= 15 THEN 'a' ELSE 'b' END AS side
              FROM events),
            grid AS (SELECT range AS bin FROM range(20)),
            a AS (SELECT bin, count(*) AS ca FROM binned WHERE side = 'a' GROUP BY 1),
            b AS (SELECT bin, count(*) AS cb FROM binned WHERE side = 'b' GROUP BY 1),
            j AS (
              SELECT g.bin, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
              FROM grid g LEFT JOIN a ON g.bin = a.bin LEFT JOIN b ON g.bin = b.bin),
            tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM j)
            SELECT round(sum(((ca + 0.5) / (ta + 10.0) - (cb + 0.5) / (tb + 10.0))
                   * ln(((ca + 0.5) / (ta + 10.0)) / ((cb + 0.5) / (tb + 10.0)))), 6) AS psi
            FROM j, tot
        """,
        "q28_stats_profile": """
            SELECT * FROM (
              SELECT 'l_discount' AS col_name, count(*) AS cnt, count(l_discount) AS n_nonnull,
                     round(sum(l_discount::DECIMAL(30,12))::DOUBLE / count(l_discount), 6) AS mean, round(sqrt((sum((l_discount * l_discount)::DECIMAL(30,10))::DOUBLE - sum(l_discount::DECIMAL(30,12))::DOUBLE * sum(l_discount::DECIMAL(30,12))::DOUBLE / count(l_discount)) / (count(l_discount) - 1)), 6) AS std,
                     round(min(l_discount), 6) AS mn, round(max(l_discount), 6) AS mx,
                     round(quantile_cont(l_discount, 0.25), 6) AS q25,
                     round(quantile_cont(l_discount, 0.5), 6) AS median,
                     round(quantile_cont(l_discount, 0.75), 6) AS q75,
                     sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END)::BIGINT AS num_zeros,
                     count(DISTINCT l_discount) AS num_unique
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', count(*), count(l_extendedprice),
                     round(sum(l_extendedprice::DECIMAL(30,12))::DOUBLE / count(l_extendedprice), 6), round(sqrt((sum((l_extendedprice * l_extendedprice)::DECIMAL(30,10))::DOUBLE - sum(l_extendedprice::DECIMAL(30,12))::DOUBLE * sum(l_extendedprice::DECIMAL(30,12))::DOUBLE / count(l_extendedprice)) / (count(l_extendedprice) - 1)), 6),
                     round(min(l_extendedprice), 6), round(max(l_extendedprice), 6),
                     NULL::DOUBLE, NULL::DOUBLE, NULL::DOUBLE,
                     sum(CASE WHEN l_extendedprice = 0 THEN 1 ELSE 0 END)::BIGINT,
                     count(DISTINCT l_extendedprice)
              FROM lineitem
              UNION ALL
              SELECT 'l_quantity', count(*), count(l_quantity),
                     round(sum(l_quantity::DECIMAL(30,12))::DOUBLE / count(l_quantity), 6), round(sqrt((sum((l_quantity * l_quantity)::DECIMAL(30,10))::DOUBLE - sum(l_quantity::DECIMAL(30,12))::DOUBLE * sum(l_quantity::DECIMAL(30,12))::DOUBLE / count(l_quantity)) / (count(l_quantity) - 1)), 6),
                     round(min(l_quantity), 6), round(max(l_quantity), 6),
                     round(quantile_cont(l_quantity, 0.25), 6),
                     round(quantile_cont(l_quantity, 0.5), 6),
                     round(quantile_cont(l_quantity, 0.75), 6),
                     sum(CASE WHEN l_quantity = 0 THEN 1 ELSE 0 END)::BIGINT,
                     count(DISTINCT l_quantity)
              FROM lineitem)
            ORDER BY col_name
        """,
        "q29_orders_without_lineitem": """
            SELECT o_orderkey FROM orders
            WHERE o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem)
            ORDER BY 1
        """,
        "q30_dim_lookup": """
            WITH dim(event_type, technique, tactic) AS (VALUES
              ('error', 'TA0040', 'Impact'),
              ('signup', 'TA0001', 'Initial Access'),
              ('purchase', 'TA0010', 'Exfiltration'))
            SELECT coalesce(technique, 'unknown') AS technique,
                   coalesce(tactic, 'unknown') AS tactic, count(*) AS cnt
            FROM events LEFT JOIN dim USING (event_type)
            GROUP BY 1, 2 ORDER BY 1
        """,
        "q31_semi_blocklist": """
            SELECT user_id, count(*) AS cnt FROM events
            WHERE user_id IN (1, 2, 3, 5, 8) GROUP BY 1 ORDER BY 1
        """,
        "q32_topk_per_group": """
            SELECT event_type, rank, event_id, round(value, 6) AS value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC) AS rank
              FROM events)
            WHERE rank <= 3 ORDER BY event_type, rank
        """,
        "q33_minhash_pairs": r"""
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
              FROM toks WHERE len(t) >= 3),
            inv AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b, round(inter / (na + nb - inter), 6) AS jaccard,
                   TRUE AS lsh_found
            FROM pairs WHERE round(inter / (na + nb - inter), 6) >= 0.2
        """,
        # q36: the clips suite runs on the deterministic synth table, which
        # _q36_clips_suite exports to _Q36_EXPORT at construction time (pure
        # function of n/seed, atomic overwrite) — the SQL twin re-derives
        # every default_clip_rule + the verdict grid from those meta rows.
        # R016 (bytes) is absent: with_bytes=False inputs skip byte rules,
        # mirroring run_row_rules' column-intersection semantics.
        "q36_clips_suite": f"""
            WITH clips AS (
              SELECT * FROM read_parquet('{_Q36_EXPORT}')
            ),
            counts AS (SELECT part_id, count(*) AS n_rows FROM clips GROUP BY part_id),
            rules(rule_id) AS (
              VALUES ('R010_sr_null'), ('R011_sr_range'), ('R012_dur_null'),
                     ('R013_dur_range'), ('R014_codec_allowed'),
                     ('R015_transcript_nonempty'), ('R018_speaking_rate')
            ),
            viol AS (
              SELECT part_id, 'R010_sr_null' AS rule_id FROM clips WHERE sr_hz IS NULL
              UNION ALL
              SELECT part_id, 'R011_sr_range' FROM clips
                WHERE sr_hz IS NOT NULL AND sr_hz NOT BETWEEN 4000 AND 96000
              UNION ALL
              SELECT part_id, 'R012_dur_null' FROM clips WHERE dur_ms IS NULL
              UNION ALL
              SELECT part_id, 'R013_dur_range' FROM clips
                WHERE dur_ms IS NOT NULL AND dur_ms NOT BETWEEN 1 AND 43200000
              UNION ALL
              SELECT part_id, 'R014_codec_allowed' FROM clips
                WHERE codec IS NULL OR codec NOT IN ('pcm_s16le','flac','mulaw','alaw','adpcm_ima','opus','mp3')
              UNION ALL
              SELECT part_id, 'R015_transcript_nonempty' FROM clips
                WHERE transcript IS NULL OR length(trim(transcript)) = 0
              UNION ALL
              SELECT part_id, 'R018_speaking_rate' FROM clips
                WHERE transcript IS NOT NULL AND length(trim(transcript)) > 0
                  AND dur_ms IS NOT NULL AND dur_ms > 0
                  AND NOT (length(trim(transcript)) * 1000.0 / dur_ms
                           BETWEEN 6.5 AND 26.5)
            ),
            vc AS (SELECT part_id, rule_id, count(*) AS n_violations FROM viol GROUP BY 1, 2)
            SELECT
              CAST(c.part_id AS INTEGER) AS part_id,
              r.rule_id,
              coalesce(vc.n_violations, 0) = 0 AS passed,
              CAST(c.n_rows AS BIGINT) AS n_rows,
              CAST(coalesce(vc.n_violations, 0) AS BIGINT) AS n_violations,
              CAST(NULL AS VARCHAR) AS observed,
              CAST(NULL AS VARCHAR) AS expected
            FROM counts c CROSS JOIN rules r
            LEFT JOIN vc ON vc.part_id = c.part_id AND vc.rule_id = r.rule_id
            ORDER BY c.part_id, r.rule_id
        """,
        "q34_simhash_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_distinct(string_split_regex(trim(lower(text)), '\s+')) AS t
              FROM documents),
            tok AS (
              SELECT doc_id, CAST(('0x' || substr(md5(unnest(t)), 1, 15)) AS BIGINT) AS h
              FROM toks),
            bits AS (
              SELECT doc_id, b,
                     sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
              FROM tok, range(60) r(b) GROUP BY 1, 2),
            sh AS (
              SELECT doc_id,
                     sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS s
              FROM bits GROUP BY 1)
            SELECT id_a, id_b, hamming FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     bit_count(xor(a.s, b.s))::BIGINT AS hamming
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            WHERE hamming <= 3
        """,
        "q37_media_features": """
            WITH m AS (
              SELECT CAST(doc_id AS VARCHAR) AS media_id,
                     CASE (doc_id % 3) WHEN 0 THEN 'image'
                                       WHEN 1 THEN 'video'
                                       ELSE 'audio' END AS kind,
                     sha256(text) AS h
              FROM documents)
            SELECT media_id, kind, TRUE AS ok, FALSE AS real, i AS feat_idx,
                   round((CAST(('0x' || substr(h, 8*i+1, 2)) AS INT)
                        + CAST(('0x' || substr(h, 8*i+3, 2)) AS INT)
                        + CAST(('0x' || substr(h, 8*i+5, 2)) AS INT)
                        + CAST(('0x' || substr(h, 8*i+7, 2)) AS INT)) / 1020.0, 6) + 0.0 AS feat_value
            FROM m, range(8) t(i)
        """,
        "q40_dup_clusters": r"""
            WITH RECURSIVE toks AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
            sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
              FROM toks WHERE len(t) >= 3),
            inv AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
            pr AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
                     count(*) AS inter
              FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4),
            jac AS (
              SELECT id_a, id_b FROM pr
              WHERE round(inter / (na + nb - inter), 6) >= 0.03),
            e AS (
              SELECT id_a AS src, id_b AS dst FROM jac
              UNION SELECT id_b, id_a FROM jac),
            reach(id, r) AS (
              SELECT src, dst FROM e
              UNION
              SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
            lab AS (
              SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
            siz AS (
              SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1)
            SELECT id, cluster_id, cluster_size,
                   id = cluster_id AS is_canonical
            FROM lab JOIN siz USING (cluster_id)
            ORDER BY id
        """,
        "q41_ivf_topk": """
            SELECT q_id, b_id, score, rank FROM (
              SELECT q_id, b_id, score,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY score DESC, b_id ASC) AS rank
              FROM (
                SELECT q.vec_id AS q_id, b.vec_id AS b_id,
                       round(list_cosine_similarity(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
                FROM embeddings q JOIN embeddings b ON q.vec_id != b.vec_id
                WHERE q.vec_id < 10))
            WHERE rank <= 5
        """,
        "q42_stratified_split": """
            SELECT CASE WHEN h IS NULL THEN NULL
                        WHEN h < 8000 THEN 'train'
                        WHEN h < 9000 THEN 'val'
                        ELSE 'test' END AS split,
                   lang, count(*) AS n
            FROM (SELECT lang,
                         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS h
                  FROM documents)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # q45: DuckDB's native ASOF JOIN is the independent oracle for the
        # union+window as-of operator (inclusive >= tie semantics on both)
        "q45_asof_join": """
            WITH errors AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
            ), clicks AS (
              SELECT user_id, ts, max(event_id) AS click_event_id
              FROM events WHERE event_type = 'click' GROUP BY 1, 2
            )
            SELECT e.event_id, e.user_id, c.click_event_id AS last_click_id
            FROM errors e ASOF LEFT JOIN clicks c
              ON e.user_id = c.user_id AND e.ts >= c.ts
            ORDER BY e.event_id
        """,
        # q46: plain inequality join — DuckDB handles the small scale; the
        # engine side uses the bucketed equi-join shape instead
        "q46_range_join": """
            WITH errors AS (
              SELECT event_id AS err_id, user_id, ts
              FROM events WHERE event_type = 'error'
            ), clicks AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
            )
            SELECT e.err_id, e.user_id, count(c.event_id)::BIGINT AS n_clicks
            FROM errors e LEFT JOIN clicks c
              ON c.user_id = e.user_id
             AND c.ts >= e.ts - INTERVAL 10 MINUTE AND c.ts <= e.ts
            GROUP BY 1, 2 ORDER BY 1
        """,
        # q47: identical lag + running-sum session logic in DuckDB window
        # SQL; all time math in integer microseconds on both engines
        "q47_sessionize": """
            WITH flagged AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                  > 1800000000
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
              SELECT *, sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
              FROM flagged
            )
            SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   round(sum(value), 6) AS total_value
            FROM numbered
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q48_vocab_topk": r"""
            SELECT token, count(*)::BIGINT AS n_occurrences,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM (SELECT doc_id,
                         unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
                  FROM documents)
            GROUP BY token
            ORDER BY n_occurrences DESC, token ASC
            LIMIT 50
        """,
        "q49_token_budget_sample": r"""
            WITH nt AS (
              SELECT doc_id, source,
                     (CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), '\s+')) END)::BIGINT AS n_tokens,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 10000 AS h
              FROM documents),
            tot AS (SELECT source, sum(n_tokens)::BIGINT AS total FROM nt GROUP BY source)
            SELECT nt.source, count(*)::BIGINT AS n_kept,
                   sum(n_tokens)::BIGINT AS kept_tokens
            FROM nt JOIN tot ON nt.source = tot.source
            WHERE h < LEAST(1.0, 800.0 / total) * 10000
            GROUP BY nt.source ORDER BY nt.source
        """,
        "q50_repetition": r"""
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
              FROM documents),
            g AS (
              SELECT doc_id, unnest(
                [array_to_string(tk[i:i+1], ' ') FOR i IN range(1, len(tk))]
              ) AS gram
              FROM t WHERE len(tk) >= 2),
            counts AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
            pd AS (
              SELECT doc_id, sum(c)::BIGINT AS n_grams,
                     sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                     max(c) AS top
              FROM counts GROUP BY doc_id),
            tg AS (
              SELECT doc_id, gram AS top_gram FROM (
                SELECT doc_id, gram,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY c DESC, gram ASC) AS rn
                FROM counts) WHERE rn = 1)
            SELECT d.doc_id AS id,
                   coalesce(pd.n_grams, 0)::BIGINT AS n_grams,
                   round(coalesce(pd.dup::DOUBLE / pd.n_grams, 0.0), 6) AS dup_gram_frac,
                   round(coalesce(pd.top::DOUBLE / pd.n_grams, 0.0), 6) AS top_gram_frac,
                   coalesce(tg.top_gram, '') AS top_gram
            FROM documents d
            LEFT JOIN pd ON d.doc_id = pd.doc_id
            LEFT JOIN tg ON d.doc_id = tg.doc_id
            ORDER BY id
        """,
        # q51: the same greedy first-fit recurrence as pack_sequences,
        # replayed sequentially per bucket by a recursive CTE (DuckDB
        # advances every bucket one row_number step per iteration).
        "q51_pack_sequences": r"""
            WITH RECURSIVE nt AS (
              SELECT doc_id,
                     coalesce(CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+'))
                     END, 0)::BIGINT AS n,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                          AS BIGINT) AS h
              FROM documents WHERE doc_id IS NOT NULL),
            b AS (
              SELECT doc_id, n, h, h % 8 AS bucket,
                     row_number() OVER (PARTITION BY h % 8
                                        ORDER BY h, doc_id) AS rn
              FROM nt),
            pack AS (
              SELECT doc_id, bucket, rn, n,
                     0::BIGINT AS win, 0::BIGINT AS pos, n AS fill
              FROM b WHERE rn = 1
              UNION ALL
              SELECT d.doc_id, d.bucket, d.rn, d.n,
                     CASE WHEN p.fill + d.n <= 64 THEN p.win ELSE p.win + 1 END,
                     CASE WHEN p.fill + d.n <= 64 THEN p.pos + 1 ELSE 0::BIGINT END,
                     CASE WHEN p.fill + d.n <= 64 THEN p.fill + d.n ELSE d.n END
              FROM b d JOIN pack p ON d.bucket = p.bucket AND d.rn = p.rn + 1)
            SELECT doc_id, bucket, win AS window_idx, pos AS pos_in_window,
                   n AS n_tokens, (n > 64) AS oversize
            FROM pack
            ORDER BY bucket, window_idx, pos_in_window
        """,
        # q52: planted-known-answer (q44/q33 scheme) — the oracle is the
        # planted acoustic-dup pair set (exported at construction time,
        # pure function of (n=600, seed=7)) with found=TRUE; a detector
        # miss flips the hash, a false positive changes the rowcount.
        "q52_audio_dup": f"""
            SELECT id_a, id_b, TRUE AS found
            FROM read_parquet('{_Q52_EXPORT}')
            ORDER BY id_a, id_b
        """,
        # q53: fully recomputing oracle — the text rung (SimHash) is
        # re-derived from the raw transcripts (the q34 twin), the audio
        # rung from the exported fingerprints, then the union + modality
        # flags are replayed in SQL. Only the fingerprint kernel itself is
        # taken from the export (it is oracled separately by q52).
        "q53_crossmodal_dup": rf"""
            WITH exp AS (SELECT * FROM read_parquet('{_Q53_EXPORT}')),
            toks AS (
              SELECT id,
                     list_distinct(string_split_regex(trim(lower(transcript)), '\s+')) AS t
              FROM exp),
            tok AS (
              SELECT id, CAST(('0x' || substr(md5(unnest(t)), 1, 15)) AS BIGINT) AS h
              FROM toks),
            bits AS (
              SELECT id, b,
                     sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
              FROM tok, range(60) r(b) GROUP BY 1, 2),
            sh AS (
              SELECT id,
                     sum(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END) AS s
              FROM bits GROUP BY 1),
            tpairs AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM sh a JOIN sh b ON a.id < b.id
              WHERE bit_count(xor(a.s, b.s)) <= 3),
            apairs AS (
              SELECT a.id AS id_a, b.id AS id_b
              FROM exp a JOIN exp b ON a.id < b.id
              WHERE NOT a.fake AND NOT b.fake
                AND a.fp IS NOT NULL AND b.fp IS NOT NULL
                AND bit_count(xor(a.fp, b.fp)) <= 3)
            SELECT coalesce(ap.id_a, tp.id_a) AS id_a,
                   coalesce(ap.id_b, tp.id_b) AS id_b,
                   (ap.id_a IS NOT NULL) AS via_audio,
                   (tp.id_a IS NOT NULL) AS via_text
            FROM apairs ap FULL OUTER JOIN tpairs tp
              ON ap.id_a = tp.id_a AND ap.id_b = tp.id_b
            ORDER BY 1, 2
        """,
        # q54: single-process reference — segments computed locally by the
        # same kernel over the locally re-synthesized int16-quantized
        # signal (bit-exact codecs only); the comparison machine-checks
        # the distributed decode + Arrow + segment arithmetic.
        "q54_speech_segments": f"""
            SELECT clip_id, CAST(seg_idx AS INTEGER) AS seg_idx,
                   start_s, end_s, dur_s, rms_db
            FROM read_parquet('{_Q54_EXPORT}')
            ORDER BY clip_id, seg_idx
        """,
        # q55: planted-known-answer (q52 scheme) — the oracle replays the
        # planted snippet->source table with found/offset_ok TRUE.
        "q56_duration_batches": """
            WITH base AS (
              SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                     CAST(length(text) AS BIGINT) AS len_chars,
                     len(list_filter([200.0, 400.0, 800.0, 1600.0],
                                     b -> b <= CAST(length(text) AS DOUBLE))) AS bucket,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       % 8 AS shard
              FROM documents WHERE length(text) IS NOT NULL AND length(text) >= 0
            ), seq AS (
              SELECT *, row_number() OVER (PARTITION BY bucket, shard
                                           ORDER BY len_chars, doc_id) AS rn
              FROM base
            ), asg AS (
              SELECT doc_id, len_chars, CAST(bucket AS INT) AS bucket,
                     CAST(shard AS INT) AS shard,
                     CAST(floor((rn - 1) / 16) AS INT) AS batch_index,
                     bucket || '-' || shard || '-'
                       || CAST(floor((rn - 1) / 16) AS INT) AS batch_id
              FROM seq
            )
            SELECT a.doc_id, a.len_chars, a.bucket, a.shard, a.batch_index,
                   a.batch_id, b.batch_n, b.batch_max_dur AS batch_max_dur,
                   b.batch_n = 16 AS is_complete
            FROM asg a JOIN (
              SELECT batch_id, CAST(count(*) AS INT) AS batch_n,
                     max(len_chars) AS batch_max_dur
              FROM asg GROUP BY batch_id
            ) b USING (batch_id)
            ORDER BY a.doc_id
        """,
        "q55_snippet_search": f"""
            SELECT query_id, clip_id, TRUE AS found, TRUE AS offset_ok
            FROM read_parquet('{_Q55_EXPORT}')
            ORDER BY query_id
        """,
    } | _long_oracles() | _promoted_oracle_sql()


def _long_oracles() -> dict[str, str]:
    sw = {
        "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
        "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
        "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
        "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
    }

    def ratio(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in sw[lang])
        return (
            f"(len(list_filter(t, x -> list_contains([{lst}], x)))::DOUBLE / len(t))"
        )

    scores = {lang: ratio(lang) for lang in sw}
    best = f"greatest({', '.join(scores.values())})"
    lang_case = "CASE WHEN " + best + " <= 0.0 THEN 'und' " + " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in sw
    ) + " END"
    en = scores["en"]
    base_cte = r"""base AS (
          SELECT doc_id, trim(text) AS tt,
                 string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents)"""
    stats_select = rf"""SELECT doc_id,
               (CASE WHEN length(tt) = 0 THEN 0 ELSE len(t) END)::BIGINT AS n_tokens,
               round(
                 0.25 * (CASE WHEN len(t) >= 5 AND len(t) <= 100000 THEN 1.0 ELSE 0.25 END)
                 + 0.25 * (CASE WHEN len(t) > 0 AND length(tt)::DOUBLE / len(t) >= 2.0
                                 AND length(tt)::DOUBLE / len(t) <= 12.0 THEN 1.0 ELSE 0.5 END)
                 + 0.25 * (CASE WHEN {en} >= 0.05 AND {en} <= 0.6 THEN 1.0 ELSE 0.5 END)
                 + 0.25 * (CASE WHEN length(tt) > 0
                                THEN length(regexp_replace(tt, '[^A-Za-z ]', '', 'g'))::DOUBLE / length(tt)
                                ELSE 0.0 END), 6) AS quality,
               {lang_case} AS lang_guess
        FROM base"""
    q25 = f"WITH {base_cte}\n        {stats_select}"
    # q43: q25's per-doc stats × q40's recursive duplicate-cluster walk →
    # the curated-set accounting row (same thresholds as the Spark side)
    q43 = rf"""
        WITH RECURSIVE {base_cte},
        stats AS ({stats_select}),
        sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
          FROM base WHERE len(t) >= 3),
        inv AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS g FROM sh),
        pr AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
                 count(*) AS inter
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4),
        jac AS (
          SELECT id_a, id_b FROM pr
          WHERE round(inter / (na + nb - inter), 6) >= 0.03),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM jac
          UNION SELECT id_b, id_a FROM jac),
        reach(id, r) AS (
          SELECT src, dst FROM e
          UNION
          SELECT reach.id, e.dst FROM reach JOIN e ON reach.r = e.src),
        lab AS (
          SELECT id, least(id, min(r)) AS cluster_id FROM reach GROUP BY id),
        nonca AS (SELECT id FROM lab WHERE id != cluster_id)
        SELECT count(*) AS n_docs,
               sum(n_tokens)::BIGINT AS total_tokens,
               round(avg(n_tokens), 6) AS avg_tokens,
               round(avg(quality), 6) AS avg_quality
        FROM stats
        WHERE doc_id NOT IN (SELECT id FROM nonca)
          AND lang_guess = 'en' AND quality >= 0.5
    """
    q44 = r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents),
        sh AS (
          SELECT doc_id,
                 list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
          FROM toks WHERE len(t) >= 3),
        corp AS (SELECT doc_id, unnest(s) AS g FROM sh),
        bench AS (
          SELECT doc_id AS bench_id, len(s) AS bn, unnest(s) AS g
          FROM sh WHERE doc_id < 15),
        m AS (
          SELECT c.doc_id, b.bench_id, b.bn, count(*) AS inter
          FROM corp c JOIN bench b ON c.g = b.g GROUP BY 1, 2, 3)
        SELECT doc_id, bench_id, inter,
               round(inter / bn, 6) AS containment
        FROM m WHERE round(inter / bn, 6) >= 0.8
        ORDER BY doc_id, bench_id
    """
    return {
        "q25_textstats": q25,
        "q35_lsh_topk": _lsh_topk_oracle(),
        "q39_embedding_dups": _embedding_dups_oracle(),
        "q43_training_selection": q43,
        "q44_decontamination": q44,
    }


def _embedding_dups_oracle() -> str:
    """Bit-exact SQL twin of _q39_embedding_dups (same technique as the
    q35 oracle: seeded hyperplanes inlined as literals, explicit
    left-associated dot sums, OR-union of per-table bucket self-joins,
    exact cosine threshold)."""
    from semantic_log_detector_spark.operators.knn import _hyperplanes

    n_planes, n_tables, dim, threshold = 6, 6, 64, 0.35

    def dot_sql(plane: list[float]) -> str:
        return " + ".join(
            f"embedding[{i + 1}]::DOUBLE * ({w!r})" for i, w in enumerate(plane)
        )

    sig_cols = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, 137 + 1000 * t)
        sig = " + ".join(
            f"(CASE WHEN ({dot_sql(p)}) > 0 THEN {1 << h}::BIGINT ELSE 0::BIGINT END)"
            for h, p in enumerate(planes)
        )
        sig_cols.append(f"({sig}) AS sig{t}")
    sig_select = ",\n                 ".join(sig_cols)
    or_join = " OR ".join(f"a.sig{t} = b.sig{t}" for t in range(n_tables))
    return f"""
        WITH sigs AS (
          SELECT vec_id, embedding,
                 {sig_select}
          FROM embeddings),
        cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                 a.embedding AS va, b.embedding AS vb
          FROM sigs a JOIN sigs b
            ON a.vec_id < b.vec_id AND ({or_join}))
        SELECT id_a, id_b,
               round(list_cosine_similarity(va::DOUBLE[], vb::DOUBLE[]), 6) AS cosine
        FROM cand
        WHERE round(list_cosine_similarity(va::DOUBLE[], vb::DOUBLE[]), 6) >= {threshold}
    """


def _lsh_topk_oracle() -> str:
    """Bit-exact SQL twin of _q35_lsh_topk: the seeded hyperplanes are
    regenerated and inlined as literals, signatures are explicit
    left-associated dot-product sums (matching functions/arrays.py dot's
    fold order), candidates are the OR-union of per-table bucket joins,
    and ranking is exact cosine over rounded scores — the whole
    approximate algorithm, reproduced in SQL."""
    from semantic_log_detector_spark.operators.knn import _hyperplanes

    n_planes, n_tables, seed, dim, k = 8, 4, 42, 64, 5

    def dot_sql(plane: list[float]) -> str:
        return " + ".join(
            f"embedding[{i + 1}]::DOUBLE * ({w!r})" for i, w in enumerate(plane)
        )

    sig_cols = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        sig = " + ".join(
            f"(CASE WHEN ({dot_sql(p)}) > 0 THEN {1 << h}::BIGINT ELSE 0::BIGINT END)"
            for h, p in enumerate(planes)
        )
        sig_cols.append(f"({sig}) AS sig{t}")
    sig_select = ",\n                 ".join(sig_cols)
    or_join = " OR ".join(f"q.sig{t} = b.sig{t}" for t in range(n_tables))
    return f"""
        WITH sigs AS (
          SELECT vec_id, embedding,
                 {sig_select}
          FROM embeddings),
        cand AS (
          SELECT DISTINCT q.vec_id AS q_id, b.vec_id AS b_id,
                 q.embedding AS qe, b.embedding AS be
          FROM sigs q JOIN sigs b
            ON q.vec_id != b.vec_id AND ({or_join})
          WHERE q.vec_id < 10),
        scored AS (
          SELECT q_id, b_id,
                 round(list_cosine_similarity(qe::DOUBLE[], be::DOUBLE[]), 6) AS score
          FROM cand)
        SELECT q_id, b_id, score, rank FROM (
          SELECT q_id, b_id, score,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY score DESC, b_id ASC) AS rank
          FROM scored)
        WHERE rank <= {k}
    """


# ---------------------------------------------------- promotions + extras
# q57/q58 were the round-4 local-gate extras xq01/xq04, promoted into the
# driver's 50-slot registry in round 5 (slots freed by the q09/q10/q11
# merge); q59/q60 are the former xq02/xq03, promoted in the same round
# (slots freed by the q08+q12 and q18+q19 merges). Every operator the
# engine claims now carries a hard driver-recorded correctness row —
# extra_queries() is kept (empty) only for the oracle harness's API.


def _q57_anomaly_explain(spark: SparkSession, sf: str) -> DataFrame:
    """Reference-parity anomaly scoring + explanations (anomaly_scorer.py:
    38-84 + explanation_engine.py:23-107): kNN mean L2 distance vs a
    percentile-fit baseline, severity buckets, top-3 neighbors, keyword
    recommendations. Scored slice = vec_id < 50, baseline = the rest."""
    from semantic_log_detector_spark.checks.anomaly import anomaly_explain

    emb = _t(spark, sf, "embeddings")
    docs = _t(spark, sf, "documents").selectExpr("doc_id as vec_id", "text")
    scored = emb.filter(F.col("vec_id") < 50).join(docs, "vec_id", "left")
    baseline = emb.filter(F.col("vec_id") >= 50)
    return anomaly_explain(scored, baseline, k=5, text_col="text").orderBy("id")


def _q59_vocab_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language vocabulary drift over `documents`: PSI of each lang's
    md5-hashed token-bucket distribution against the whole corpus
    (operators/textstats.py::vocab_psi — the text twin of the audio drift
    check; same smoothing/rounding conventions as the oracled q27)."""
    from semantic_log_detector_spark.operators.textstats import vocab_psi

    return vocab_psi(_t(spark, sf, "documents"), text_col="text",
                     group_col="lang", n_buckets=64)


def _q60_lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM perplexity of every document against the corpus' own LM
    (operators/textstats.py::train_bigram_lm + lm_perplexity — the
    CCNet/Gopher-style quality signal; Jelinek–Mercer λ=0.75, add-1
    unigram back-off). The DuckDB twin replays train + score exactly."""
    from semantic_log_detector_spark.operators.textstats import (
        lm_perplexity,
        train_bigram_lm,
    )

    docs = _t(spark, sf, "documents")
    bigrams, unigrams, stats = train_bigram_lm(docs, text_col="text")
    return lm_perplexity(docs, bigrams, unigrams, stats,
                         text_col="text", id_col="doc_id")


def _q58_export_path() -> str:
    """Oracle side-channel path for the pitch fixture, keyed on a hash of
    the fixture spec (n, seed, PITCH_FIXTURE_VERSION): concurrent harness
    runs of the same tree write byte-identical content (the fixture is a
    pure function of the spec, and the write below is an atomic replace),
    while a changed fixture — any bump of PITCH_FIXTURE_VERSION — lands on
    a fresh path, so a stale export from an aborted older run can never be
    read (round-4 verdict "what's wrong" #1)."""
    import hashlib

    from semantic_log_detector_spark.sources.synth import PITCH_FIXTURE_VERSION

    spec = f"pitch:n=480:seed=11:v={PITCH_FIXTURE_VERSION}"
    h = hashlib.md5(spec.encode()).hexdigest()[:12]
    return f"/tmp/sldspark_oracle_q58_pitch_{h}.parquet"


def _q58_pitch_verdicts(spark: SparkSession, sf: str) -> DataFrame:
    """Pitch-profile verdicts against planted ground truth (q52 scheme):
    480 clips in four deterministic classes — known-F0 tones, speech-like
    glides, noise, silence — across all five real codecs and two sample
    rates (sources/synth.py::pitch_clips). pitch_features
    (operators/features.py) must label every tone 'flat' (voiced, IQR≤10),
    every glide 'wander' (voiced, IQR≥25), noise/silence 'unvoiced'
    (voiced_ratio≤0.2), and recover each tone's planted F0 within 3%.
    The oracle replays the planted class→label map from the export: any
    misclassification or F0 miss flips the value hash."""
    import os

    from semantic_log_detector_spark.operators.features import pitch_features
    from semantic_log_detector_spark.sources.synth import pitch_clips

    clips = pitch_clips(spark, 480, seed=11)
    truth = (clips.select("clip_id", "cls", "f0_true")
             .toPandas().sort_values("clip_id"))
    export = _q58_export_path()
    tmp = f"{export}.{os.getpid()}.tmp"
    truth.to_parquet(tmp, index=False)
    os.replace(tmp, export)  # atomic, idempotent: pure fn of the spec
    pf = pitch_features(clips)
    vr = F.col("voiced_ratio")
    spread = F.col("f0_spread_hz")
    label = (
        F.when((vr >= 0.8) & (spread <= 10.0), F.lit("flat"))
        .when((vr >= 0.6) & (spread >= 25.0), F.lit("wander"))
        .when(vr <= 0.2, F.lit("unvoiced"))
        .otherwise(F.lit("ambiguous"))
    )
    exp = spark.createDataFrame(truth)
    return (
        exp.join(pf, "clip_id")
        .select(
            "clip_id",
            "cls",
            label.alias("label"),
            F.when(
                F.col("cls") == "tone",
                F.abs(F.col("median_f0_hz") - F.col("f0_true"))
                <= 0.03 * F.col("f0_true"),
            ).alias("f0_ok"),
        )
        .orderBy("clip_id")
    )


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # empty since the round-5 q59/q60 promotions: every oracle-twinned
    # query now lives in the driver's 50-slot registry (queries()).
    return {}


def _promoted_oracle_sql() -> dict[str, str]:
    """Oracles for the round-5 promotions (merged into oracle_sql())."""
    return {
        "q57_anomaly_explain": """
            WITH bl AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50),
            sc AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 50),
            bl_rank AS (
              SELECT q_id, dist FROM (
                SELECT q.vec_id AS q_id, b.vec_id AS b_id,
                       round(list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY round(list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) ASC,
                                                   b.vec_id ASC) AS rnk
                FROM bl q JOIN bl b ON q.vec_id != b.vec_id)
              WHERE rnk <= 5),
            fit AS (
              SELECT quantile_cont(md, 0.95) AS threshold, avg(md) AS base_mean,
                     stddev_pop(md) AS base_std
              FROM (SELECT q_id, avg(dist) AS md FROM bl_rank GROUP BY q_id)),
            sc_rank AS (
              SELECT q_id, b_id, dist, rnk FROM (
                SELECT q.vec_id AS q_id, b.vec_id AS b_id,
                       round(list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dist,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY round(list_distance(q.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) ASC,
                                                   b.vec_id ASC) AS rnk
                FROM sc q JOIN bl b ON q.vec_id != b.vec_id)
              WHERE rnk <= 5),
            sc_means AS (
              SELECT q_id, avg(dist) AS mean_distance,
                     string_agg(CASE WHEN rnk <= 3 THEN b_id::VARCHAR END, ';' ORDER BY rnk) AS top_neighbors,
                     min(CASE WHEN rnk = 1 THEN dist END) AS nn_distance
              FROM sc_rank GROUP BY q_id),
            sev AS (
              SELECT m.q_id AS id, m.mean_distance, m.top_neighbors, m.nn_distance,
                     least(m.mean_distance / (2 * f.threshold), 1.0) AS score_raw,
                     m.mean_distance > f.threshold AS is_anomaly,
                     least(abs(m.mean_distance - f.base_mean) / greatest(f.base_std, 0.01) / 3, 1.0) AS conf_raw,
                     CASE WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 0.3 THEN 'Low'
                          WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 0.6 THEN 'Medium'
                          WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 0.8 THEN 'High'
                          ELSE 'Critical' END AS severity,
                     CASE WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 0.3 THEN 'This log shows minor deviation from normal patterns.'
                          WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 0.6 THEN 'This log shows moderate deviation from established patterns.'
                          WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 0.8 THEN 'This log shows significant deviation that warrants investigation.'
                          WHEN least(m.mean_distance / (2 * f.threshold), 1.0) < 1.0 THEN 'This log is highly anomalous and requires immediate attention.'
                          ELSE 'Extremely anomalous pattern detected.' END AS sev_desc
              FROM sc_means m CROSS JOIN fit f),
            txt AS (SELECT doc_id AS id, lower(coalesce(text, '')) AS t
                    FROM documents WHERE doc_id < 50)
            SELECT s.id, round(s.mean_distance, 6) AS mean_distance,
                   round(score_raw, 6) AS anomaly_score, is_anomaly,
                   round(conf_raw, 6) AS confidence, severity,
                   severity || ' severity anomaly detected. ' || sev_desc AS summary,
                   top_neighbors, round(nn_distance, 6) AS nn_distance,
                   (CASE WHEN severity IN ('Critical', 'High')
                         THEN 'Investigate this log immediately|Check related system components|Review recent changes in the affected service'
                         WHEN severity = 'Medium'
                         THEN 'Monitor for recurring patterns|Add to watchlist for future occurrences'
                         ELSE 'Continue monitoring; no immediate action required' END)
                   || (CASE WHEN coalesce(t, '') LIKE '%error%' OR coalesce(t, '') LIKE '%fail%'
                            THEN '|Check error handling and recovery mechanisms' ELSE '' END)
                   || (CASE WHEN coalesce(t, '') LIKE '%timeout%'
                            THEN '|Review network connectivity and service dependencies' ELSE '' END)
                   || (CASE WHEN coalesce(t, '') LIKE '%memory%' OR coalesce(t, '') LIKE '%cpu%'
                            THEN '|Monitor resource utilization trends' ELSE '' END)
                   || (CASE WHEN coalesce(t, '') LIKE '%auth%' OR coalesce(t, '') LIKE '%login%'
                            THEN '|Review authentication logs for security concerns' ELSE '' END)
                   AS recommendations
            FROM sev s LEFT JOIN txt ON s.id = txt.id
            ORDER BY s.id
        """,
        # q58: planted-known-answer (q52 scheme) — the oracle maps each
        # planted class to its required verdict; the Spark side computes
        # the verdicts from decoded PCM, so a misclassified clip or a
        # >3% F0 error produces a value-hash mismatch. The planted tone
        # band [55, 440) deliberately includes the 50-65 Hz mains-hum
        # region fixed in round 5 (functions/audio.py::frame_f0 taper).
        "q58_pitch_verdicts": f"""
            SELECT clip_id, cls,
                   CASE cls WHEN 'tone' THEN 'flat'
                            WHEN 'glide' THEN 'wander'
                            ELSE 'unvoiced' END AS label,
                   CASE WHEN cls = 'tone' THEN TRUE ELSE NULL END AS f0_ok
            FROM read_parquet('{_q58_export_path()}')
            ORDER BY clip_id
        """,
        "q59_vocab_drift": """
            WITH tk AS (
              SELECT lang AS grp, tok
              FROM documents,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS u(tok)
              WHERE tok <> ''),
            cnt AS (
              SELECT grp,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 64 AS bucket,
                     count(*) AS c
              FROM tk GROUP BY 1, 2),
            grid AS (
              SELECT g.grp, r.range AS bucket
              FROM (SELECT DISTINCT grp FROM cnt) g, range(64) r),
            j AS (
              SELECT grid.grp, grid.bucket, coalesce(cnt.c, 0) AS c
              FROM grid LEFT JOIN cnt
                ON grid.grp = cnt.grp AND grid.bucket = cnt.bucket),
            bt AS (SELECT bucket, sum(c) AS cb FROM j GROUP BY 1),
            gt AS (SELECT grp, sum(c) AS tg FROM j GROUP BY 1),
            tot AS (SELECT sum(c) AS tt FROM j)
            SELECT j.grp AS lang, max(gt.tg)::BIGINT AS n_tokens,
                   round(sum(((j.c + 0.5) / (gt.tg + 32.0)
                              - (bt.cb + 0.5) / (tot.tt + 32.0))
                         * ln(((j.c + 0.5) / (gt.tg + 32.0))
                              / ((bt.cb + 0.5) / (tot.tt + 32.0)))), 6)
                   AS vocab_psi
            FROM j JOIN bt USING (bucket) JOIN gt USING (grp), tot
            GROUP BY j.grp ORDER BY lang
        """,
        "q60_lm_perplexity": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\\s+') AS t
              FROM documents),
            e AS (
              SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
              FROM toks, unnest(range(1, len(t))) AS r(i)),
            uni AS (
              SELECT w1, count(*) AS n1
              FROM (SELECT unnest(t) AS w1 FROM toks) GROUP BY 1),
            big AS (SELECT w1, w2, count(*) AS n12 FROM e GROUP BY 1, 2),
            st AS (SELECT count(*)::DOUBLE AS v, sum(n1)::DOUBLE AS n FROM uni),
            sc AS (
              SELECT e.doc_id,
                     ln(0.75 * (CASE WHEN coalesce(uni.n1, 0) > 0
                                     THEN coalesce(big.n12, 0)::DOUBLE / uni.n1
                                     ELSE 0.0 END)
                        + 0.25 * ((coalesce(u2.n1, 0)::DOUBLE + 1.0)
                                  / (st.n + st.v))) AS logp
              FROM e
              LEFT JOIN big USING (w1, w2)
              LEFT JOIN uni USING (w1)
              LEFT JOIN uni u2 ON e.w2 = u2.w1, st)
            SELECT d.doc_id, count(logp) AS n_bigrams,
                   round(avg(logp), 6) + 0.0 AS avg_logp,
                   round(exp(-avg(logp)), 6) + 0.0 AS ppl
            FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
            GROUP BY d.doc_id
        """,
    }


def extra_oracle_sql() -> dict[str, str]:
    # empty since the round-5 q59/q60 promotions (see extra_queries).
    return {}

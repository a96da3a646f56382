"""Similarity search over embedding columns (SURVEY.md J4/J5 → Spark).

The reference's FAISS IndexFlatL2/IndexIVFFlat (`src/detection/vector_db.py:
82-109,152-201`) becomes:

- ``brute_force_topk``: exact top-k — join + JVM-side dot products
  (higher-order functions) + per-query window rank. The correctness
  baseline; broadcast the smaller side.
- ``lsh_topk``: the scale path — random-hyperplane LSH signs bucket the
  vectors (the analog of IVF's coarse quantizer: search only matching
  cells, `vector_db.py:87-96` nprobe idea). Multiple hash tables raise
  recall; candidates are exact-ranked within buckets.

At 10^12 base vectors the bucketing bounds each query's candidate set;
hyperplanes are literal arrays (driver-seeded, deterministic) so plans stay
whole-stage-codegen — no Python UDFs anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine_similarity, dot, l2_norm


def brute_force_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    base_id: str = "b_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    broadcast_base: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query. Excludes self-matches on equal ids
    (the reference's k+1 self-search exclusion, pipeline.py:124-134)."""
    # compute in float64 end-to-end: float32 dot products drift past the
    # 6-dp rounding used for oracle comparison
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).cast("array<double>").alias("__qv"))
    b = base.select(F.col(base_id).alias("__bid"), F.col(vec_col).cast("array<double>").alias("__bv"))
    if broadcast_base:
        b = F.broadcast(b)
    joined = q.join(b, F.col("__qid") != F.col("__bid"))
    if metric == "cosine":
        sim = cosine_similarity(F.col("__qv"), F.col("__bv"))
        order = F.desc("score")
    elif metric == "l2":
        d = F.zip_with("__qv", "__bv", lambda x, y: (x - y) * (x - y))
        sim = -F.sqrt(F.aggregate(d, F.lit(0.0), lambda a, x: a + x))
        order = F.desc("score")
    else:
        raise ValueError(metric)
    w = Window.partitionBy("__qid").orderBy(order, F.asc("__bid"))
    return (
        joined.withColumn("score", F.round(sim, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__bid").alias(base_id),
            "score",
            "rank",
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit h = (vec · plane_h) > 0, packed into a long."""
    sig = F.lit(0).cast("long")
    for h, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        sig = sig + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), h)).otherwise(0)
    return sig


def lsh_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    base_id: str = "b_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of `n_tables` hyperplane-bucket joins,
    exact cosine rank within candidates. Recall rises with n_tables;
    candidates per query ≈ n_tables × bucket size (2^-n_planes of base)."""
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).cast("array<double>").alias("__qv"))
    b = base.select(F.col(base_id).alias("__bid"), F.col(vec_col).cast("array<double>").alias("__bv"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qs = q.withColumn("__sig", lsh_signature(F.col("__qv"), planes))
        bs = b.withColumn("__sig", lsh_signature(F.col("__bv"), planes))
        c = qs.join(bs, "__sig").filter(F.col("__qid") != F.col("__bid")).drop("__sig")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["__qid", "__bid"])
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc("__bid"))
    return (
        cand.withColumn(
            "score", F.round(cosine_similarity(F.col("__qv"), F.col("__bv")), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id), F.col("__bid").alias(base_id), "score", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    base: DataFrame,
    k: int = 5,
    query_id: str = "q_id",
    base_id: str = "b_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    sample_fraction: float | None = None,
    max_train_vectors: int = 1_000_000,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer + nprobe cell search —
    the direct analog of the reference's IndexIVFFlat
    (`src/detection/vector_db.py:87-96`: train coarse cells, search only
    nprobe matching cells, exact-rank within).

    Train: pyspark.ml KMeans on (a sample of) the base vectors (seeded,
    deterministic). Assign: each base vector joins its nearest centroid
    cell (centroids are driver-side literals — the assignment is a narrow
    JVM-side projection, no shuffle). Search: each query probes its
    ``nprobe`` nearest cells; candidates are cell-matched via hash join,
    then exact-cosine ranked. ``nprobe == n_cells`` degrades gracefully to
    exact brute force — the correctness crosscheck in tests.

    At 10^12 base vectors the cell assignment is a narrow map over the
    stored table (precomputable and persistable as a column), and each
    query touches ~nprobe/n_cells of the base via the cell equi-join."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    b = base.select(F.col(base_id).alias("__bid"), F.col(vec_col).cast("array<double>").alias("__bv"))
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).cast("array<double>").alias("__qv"))

    # Coarse-quantizer fit is BOUNDED by default: at 10^12 base vectors a
    # full-base KMeans fit is itself a multi-pass ML job, and centroid
    # quality saturates long before 10^6 training points (n_cells ≤ a few
    # thousand). Full-probe results are centroid-INDEPENDENT (every cell is
    # probed), so bounding the fit never changes the nprobe == n_cells
    # answer — only which cells partial probes visit.
    #
    # The default bound is limit(max_train_vectors) — NO extra Spark job:
    # an eager b.count() here would be a full job over an arbitrary
    # upstream plan (round-3 ADVICE; the same build-time-synchronous-job
    # pattern the dedup guard deliberately avoids), and the fit's scan
    # early-terminates after max_train_vectors rows instead. The trade:
    # the training prefix follows partition order, so a sorted/clustered
    # base can bias partial-probe centroids — pass sample_fraction
    # explicitly for an unbiased Bernoulli fit (1.0 = full-base fit) when
    # that matters; at n_base <= max_train_vectors the limit is the whole
    # base and the fit is identical to sample_fraction=1.0.
    if sample_fraction is None:
        train = b.limit(int(max_train_vectors))
    else:
        train = b if sample_fraction >= 1.0 else b.sample(sample_fraction, seed=seed)
    km = KMeans(k=n_cells, seed=seed, featuresCol="__feat", predictionCol="__cell")
    model = km.fit(train.select(array_to_vector("__bv").alias("__feat")))
    centroids = [np.asarray(c).tolist() for c in model.clusterCenters()]

    def _cell_dists(vec: Column) -> Column:
        """array of squared L2 distances to each centroid — literals, so the
        projection stays JVM-side whole-stage codegen."""
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(float(x)) for x in c]),
                               lambda a, b2: (a - b2) * (a - b2)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in centroids
            ]
        )

    def _argmin_cells(dists: Column, n: int) -> Column:
        """indices of the n smallest distances (deterministic ties by idx)."""
        idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
        pairs = F.transform(
            idx, lambda i: F.struct(F.element_at(dists, i + 1).alias("d"), i.alias("i"))
        )
        return F.slice(F.transform(F.array_sort(pairs), lambda s: s["i"]), 1, n)

    bs = b.withColumn("__cell", _argmin_cells(_cell_dists(F.col("__bv")), 1)[0])
    qs = q.withColumn(
        "__probe", F.explode(_argmin_cells(_cell_dists(F.col("__qv")), nprobe))
    )
    cand = (
        qs.join(bs, qs["__probe"] == bs["__cell"])
        .filter(F.col("__qid") != F.col("__bid"))
        .drop("__probe", "__cell")
        .dropDuplicates(["__qid", "__bid"])
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc("__bid"))
    return (
        cand.withColumn("score", F.round(cosine_similarity("__qv", "__bv"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias(query_id), F.col("__bid").alias(base_id), "score", "rank")
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (training-data dedup ladder):
    LSH-bucketed candidate generation + exact cosine filter."""
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    cand = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, 137 + 1000 * t)
        s = b.withColumn("__sig", lsh_signature(F.col("v"), planes))
        a2, b2 = s.alias("a"), s.alias("b")
        c = a2.join(
            b2, (F.col("a.__sig") == F.col("b.__sig")) & (F.col("a.id") < F.col("b.id"))
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return (
        cand.withColumn("cosine", F.round(cosine_similarity("va", "vb"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension embedding stats (mean/std/min/max), one pass.

    The reference computes per-dim mean/std over its n×768 embedding matrix
    driver-side (`src/ids/drift_baseline.py:91-147`); at 10^12 rows that
    becomes posexplode → groupBy(dim): hash aggregation with `dims` groups
    partial-combines map-side, so the shuffle carries ≤ dims×tasks rows,
    never the exploded table. Decimal-exact sums make mean/std independent
    of summation order (same device as the stats profile)."""
    e = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
    )
    s = F.sum(F.col("v").cast("decimal(30,12)")).cast("double")
    s2 = F.sum((F.col("v") * F.col("v")).cast("decimal(30,10)")).cast("double")
    n = F.count("v")
    var = (s2 - s * s / n) / (n - 1)
    return (
        e.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            n.alias("n"),
            (F.round(s / n, 6) + 0.0).alias("mean"),
            (F.round(F.sqrt(var), 6) + 0.0).alias("std"),
            (F.round(F.min("v"), 6) + 0.0).alias("mn"),
            (F.round(F.max("v"), 6) + 0.0).alias("mx"),
        )
        .orderBy("dim")
    )


def norm_stats(df: DataFrame, group_col: str, vec_col: str = "embedding") -> DataFrame:
    """A15/F13: per-group embedding L2-norm stats — the reference's
    embedding-distribution baseline (drift_baseline.py:91-147)."""
    n = l2_norm(F.col(vec_col).cast("array<double>"))
    return (
        df.select(F.col(group_col), n.alias("norm"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("norm"), 6).alias("norm_mean"),
            F.round(F.stddev_samp("norm"), 6).alias("norm_std"),
            F.round(F.min("norm"), 6).alias("norm_min"),
            F.round(F.max("norm"), 6).alias("norm_max"),
        )
    )

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


# --------------------------------------------------- product quantization

# PQ is the MEMORY-bound scale path the reference's IndexFlatL2 cannot take
# (`src/detection/vector_db.py:82-109` keeps raw float vectors resident):
# at 10^12 × 64-d float64 the raw vectors are ~0.5 PB, while m=8 PQ codes
# are 8 TB — a table a cluster can actually keep hot. The trade is ADC
# (asymmetric distance computation): exact query-to-centroid tables, coded
# base side. The Spark shape mirrors FAISS IndexPQ re-expressed
# declaratively: fit on a bounded sample (centroid quality saturates long
# before 10^5 points — same argument as ivf_topk's bounded fit), encode as
# one narrow Arrow-batch map (a persistable BINARY column, m bytes/vector),
# search as one mapInArrow over the codes with the query distance tables
# broadcast — the base table NEVER shuffles; only per-batch top-k
# candidate rows (≤ batches × queries × k) reach the final global rank.


def _kmeans_np(x: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Deterministic Lloyd's k-means (numpy, driver-side, bounded input).

    Used per PQ subspace instead of m separate pyspark.ml KMeans jobs: the
    training input is already a driver-side bounded sample, so spinning up
    m distributed fits would be pure scheduling overhead. Empty clusters
    re-seed to the point farthest from its centroid (deterministic)."""
    n = len(x)
    rng = np.random.Generator(np.random.PCG64(seed))
    cents = x[rng.choice(n, size=min(k, n), replace=False)].astype(np.float64)
    if len(cents) < k:  # fewer points than centroids: pad by cycling
        reps = -(-k // len(cents))
        cents = np.tile(cents, (reps, 1))[:k]
    for _ in range(iters):
        # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c drops ||x||²
        d = -2.0 * x @ cents.T + (cents * cents).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        err = d[np.arange(n), assign]
        new = np.zeros_like(cents)
        counts = np.bincount(assign, minlength=k)
        np.add.at(new, assign, x)
        nonempty = counts > 0
        new[nonempty] /= counts[nonempty, None]
        if (~nonempty).any():
            # farthest points, worst-first, one per empty cluster (cycling
            # when there are more empty clusters than points — k > n)
            far = np.argsort(-err, kind="stable")
            n_empty = int((~nonempty).sum())
            new[~nonempty] = x[far[np.arange(n_empty) % n]]
        if np.allclose(new, cents):
            cents = new
            break
        cents = new
    return cents


def pq_fit(
    base: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    max_train_vectors: int = 100_000,
    iters: int = 25,
) -> np.ndarray:
    """Train PQ codebooks: (m, ksub, dim/m) float64 ndarray.

    The vector dim must divide evenly by ``m``. Training reads at most
    ``max_train_vectors`` rows (limit — no extra count job, same contract
    as ivf_topk's bounded fit; pass a pre-sampled frame for an unbiased
    fit on clustered/sorted bases)."""
    rows = (
        base.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(int(max_train_vectors))
        .toPandas()["v"]
    )
    x = np.asarray([np.asarray(r, dtype=np.float64) for r in rows])
    if len(x) == 0:
        raise ValueError("pq_fit: no training vectors")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(x) < ksub:
        # a tiny first increment must not crash ingest: shrink the
        # codebook to the data (ADC is shape-agnostic; recall is bounded
        # by the data anyway). The saved codebooks carry the real ksub.
        import warnings

        warnings.warn(
            f"pq_fit: only {len(x)} training vectors for ksub={ksub}; "
            f"shrinking ksub to {len(x)}",
            stacklevel=2,
        )
        ksub = len(x)
    dsub = dim // m
    return np.stack([
        _kmeans_np(np.ascontiguousarray(x[:, j * dsub:(j + 1) * dsub]),
                   ksub, seed + j, iters)
        for j in range(m)
    ])


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code binary) — each vector coded to m bytes (nearest centroid
    per subspace). One narrow mapInPandas, no shuffle: at corpus scale the
    code column is computed once and persisted next to the table, then
    every search runs against codes alone (the raw vectors stay cold)."""
    m, ksub, dsub = codebooks.shape
    cb = codebooks  # closure-captured; a few MB at most
    cnorm = (cb * cb).sum(axis=2)  # (m, ksub)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            if len(x) == 0:
                yield pd.DataFrame({id_col: pdf[id_col], code_col: []})
                continue
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                xj = x[:, j * dsub:(j + 1) * dsub]
                d = -2.0 * xj @ cb[j].T + cnorm[j][None, :]
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                code_col: [c.tobytes() for c in codes],
            })

    out_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {out_t}, {code_col} binary")


def pq_topk(
    queries: DataFrame,
    base_codes: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    query_id: str = "q_id",
    base_id: str = "b_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    max_queries: int = 10_000,
    rerank: int = 0,
    rerank_base: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (q_id, b_id, dist, rank), dist = PQ-approximated squared
    L2, ascending. The query batch is collected and its per-subspace
    distance tables (Q × m × ksub) broadcast; the coded base is scanned
    ONCE with no shuffle — each Arrow batch contributes its local top-k
    per query (ties broken by base id, so the global rank is deterministic
    and independent of partitioning), and only those candidate rows reach
    the final window rank. Exact when base vectors lie on the codebook
    grid (the planted-fixture test); recall-tested on clustered data.

    ADC cannot rank WITHIN a code cell (every vector sharing a code is
    equidistant — on tightly clustered data the top-k inside a cluster is
    id-tie-broken, not distance-ranked). ``rerank=R`` with ``rerank_base``
    (the raw-vector table) applies the standard fix: take the top R ≥ k
    ADC candidates, fetch ONLY those R×Q raw vectors via a broadcast
    semi-join of the (tiny) candidate list against the base table — the
    base side still never shuffles — and exact-rank them. dist is then
    true squared L2 on the survivors.

    ``max_queries`` bounds the per-pass BROADCAST (one m×ksub float table
    per query), not the caller (round-5: the old hard error made the
    documented contract the caller's problem). A larger query side is
    processed in internal chunks of ``max_queries`` — the query stream is
    pulled one chunk at a time (toLocalIterator, never all resident), and
    each chunk is one full no-shuffle base scan, so Q queries cost
    ceil(Q/max_queries) scans; the per-chunk broadcast bound is real, not
    just per-plan: with ≥2 chunks each chunk's top-k is materialized
    (localCheckpoint) and its broadcast destroyed before the next chunk's
    is built, so at most ONE chunk's distance tables are ever resident
    (the single-chunk case stays fully lazy). An empty query side returns
    an empty result, not an error. Query ids must be unique (the standard
    kNN contract)."""
    def chunk(qrows):
        return _pq_topk_chunk(
            qrows, base_codes, codebooks, k=k, query_id=query_id,
            base_id=base_id, vec_col=vec_col, code_col=code_col,
            rerank=rerank, rerank_base=rerank_base,
            query_schema=queries.schema)

    return _chunked_query_topk(
        queries, base_codes, query_id, vec_col, base_id, max_queries, chunk)


def _chunked_query_topk(
    queries: DataFrame,
    base_codes: DataFrame,
    query_id: str,
    vec_col: str,
    base_id: str,
    max_queries: int,
    chunk_fn,
) -> DataFrame:
    """Shared pq_topk/ivfpq_topk chunk loop. ``chunk_fn(qrows) -> (df,
    broadcast)``. Single chunk: returned lazily (one resident broadcast is
    the documented bound, no eager job). Multiple chunks: each chunk's
    result — top-k rows only, Q_chunk × k — is materialized via eager
    localCheckpoint and the chunk's driver/executor broadcast destroyed
    before the next chunk is built, so resident broadcast memory is
    bounded by ONE chunk regardless of Q. The checkpoint cuts lineage, so
    the destroyed broadcast can never be re-demanded (block loss under a
    localCheckpoint is already fatal by Spark's contract)."""
    from itertools import islice

    it = queries.select(query_id, vec_col).toLocalIterator()
    out = None
    qrows = list(islice(it, max_queries))
    while qrows:
        # last-chunk detection peeks ONE row (round 6, ADVICE #2) — the
        # old full-chunk look-ahead kept TWO chunks of collected query
        # rows resident on the driver, exceeding the documented one-chunk
        # bound for large max_queries with wide vectors
        peek = list(islice(it, 1))
        df, bc = chunk_fn(qrows)
        if out is None and not peek:
            return df
        df = df.localCheckpoint(eager=True)
        bc.destroy()
        out = df if out is None else out.unionByName(df)
        qrows = peek + list(islice(it, max_queries - 1)) if peek else []
    if out is None:
        qt = queries.schema[query_id].dataType.simpleString()
        bt = base_codes.schema[base_id].dataType.simpleString()
        return queries.sparkSession.createDataFrame(
            [], f"{query_id} {qt}, {base_id} {bt}, dist double, rank int")
    return out


def _pq_topk_chunk(
    qrows: list,
    base_codes: DataFrame,
    codebooks: np.ndarray,
    k: int,
    query_id: str,
    base_id: str,
    vec_col: str,
    code_col: str,
    rerank: int,
    rerank_base: DataFrame | None,
    query_schema,
) -> tuple:
    """(result DataFrame, the chunk's driver broadcast) for ≤ max_queries
    collected query rows — the broadcast-bounded unit pq_topk loops over;
    the caller owns the broadcast's lifecycle."""
    m, ksub, dsub = codebooks.shape
    qids = [r[query_id] for r in qrows]
    qv = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    # tables[i, j, c] = ||q_i[j] - C[j, c]||²
    tables = np.empty((len(qids), m, ksub))
    for j in range(m):
        xj = qv[:, j * dsub:(j + 1) * dsub]
        tables[:, j, :] = (
            (xj * xj).sum(axis=1)[:, None]
            - 2.0 * xj @ codebooks[j].T
            + (codebooks[j] * codebooks[j]).sum(axis=1)[None, :]
        )
    if rerank and rerank_base is None:
        raise ValueError("rerank needs rerank_base (the raw-vector table)")
    keep = max(int(rerank), k) if rerank else k
    spark = base_codes.sparkSession
    bc = spark.sparkContext.broadcast((qids, tables))
    jidx = np.arange(m)

    def gen(batches):
        import pandas as pd

        q_ids, tabs = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf[code_col]), dtype=np.uint8).reshape(n, m)
            bids = pdf[base_id].to_numpy()
            out_q, out_b, out_d = [], [], []
            for qi, qid in enumerate(q_ids):
                d = tabs[qi][jidx[None, :], codes].sum(axis=1)
                # deterministic local top-k: (dist, base_id) lexicographic.
                # +1 slot so the self-match (filtered globally) can never
                # starve a batch's contribution below keep real candidates.
                top = np.lexsort((bids, d))[: keep + 1]
                out_q.extend([qid] * len(top))
                out_b.extend(bids[top].tolist())
                out_d.extend(d[top].tolist())
            yield pd.DataFrame({query_id: out_q, base_id: out_b, "dist": out_d})

    qt = query_schema[query_id].dataType.simpleString()
    bt = base_codes.schema[base_id].dataType.simpleString()
    cand = base_codes.select(base_id, code_col).mapInPandas(
        gen, schema=f"{query_id} {qt}, {base_id} {bt}, dist double")
    w = Window.partitionBy(query_id).orderBy(F.asc("dist"), F.asc(base_id))
    ranked = (
        cand.filter(F.col(query_id) != F.col(base_id))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= keep)
    )
    if rerank:
        qdf = spark.createDataFrame(
            [(qid, v.tolist()) for qid, v in zip(qids, qv)],
            f"{query_id} {qt}, __qv array<double>",
        )
        bv = rerank_base.select(
            F.col(base_id), F.col(vec_col).cast("array<double>").alias("__bv"))
        # candidate list is ≤ Q × rerank rows — broadcast it so the raw
        # base table is semi-joined in place, never shuffled
        exact = (
            bv.join(F.broadcast(ranked.drop("dist", "rank")), base_id)
            .join(F.broadcast(qdf), query_id)
            .withColumn("dist", F.aggregate(
                F.zip_with("__qv", "__bv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda a, x: a + x))
        )
        ranked = (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    return ranked.select(
        query_id, base_id, (F.round("dist", 6) + 0.0).alias("dist"), "rank"), bc


# ------------------------------------------------------------------ IVF-PQ

# The composed production index (FAISS IndexIVFPQ re-expressed): coarse
# KMeans cells prune WHICH codes a query reads (IVF), residual PQ codes
# bound WHAT each read costs (m bytes + one LUT gather per vector). The
# residual trick — encode x − centroid[cell], not x — is what makes a
# shared codebook work across cells: residuals live in one small ball
# around the origin regardless of which cell the vector sits in.


def ivfpq_fit(
    base: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    max_train_vectors: int = 100_000,
    iters: int = 25,
) -> tuple[np.ndarray, np.ndarray]:
    """(centroids (n_cells, dim), codebooks (m, ksub, dim/m)) trained on a
    bounded sample — one collect, same contract as pq_fit/ivf_topk: cell
    and codebook quality saturate long before 10^5 points. Codebooks are
    fit on cell RESIDUALS (shared across cells, FAISS-style)."""
    rows = (
        base.select(F.col(vec_col).cast("array<double>").alias("v"))
        .limit(int(max_train_vectors))
        .toPandas()["v"]
    )
    x = np.asarray([np.asarray(r, dtype=np.float64) for r in rows])
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    cents = _kmeans_np(x, n_cells, seed, iters)
    d = -2.0 * x @ cents.T + (cents * cents).sum(axis=1)[None, :]
    resid = x - cents[d.argmin(axis=1)]
    dsub = dim // m
    books = np.stack([
        _kmeans_np(np.ascontiguousarray(resid[:, j * dsub:(j + 1) * dsub]),
                   ksub, seed + 1 + j, iters)
        for j in range(m)
    ])
    return cents, books


def ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell int, pq_code binary): nearest coarse cell + m-byte PQ code
    of the residual. One narrow mapInPandas, no shuffle — persist this
    next to the table (and, at corpus scale, cluster/bucket the persisted
    codes BY cell so partial probes prune at the file level)."""
    m, ksub, dsub = codebooks.shape
    cents, cb = centroids, codebooks
    cn = (cents * cents).sum(axis=1)
    bn = (cb * cb).sum(axis=2)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            if len(x) == 0:
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "cell": [], "pq_code": []})
                continue
            cell = (-2.0 * x @ cents.T + cn[None, :]).argmin(axis=1)
            r = x - cents[cell]
            codes = np.empty((len(x), m), dtype=np.uint8)
            for j in range(m):
                rj = r[:, j * dsub:(j + 1) * dsub]
                codes[:, j] = (-2.0 * rj @ cb[j].T + bn[j][None, :]).argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "cell": cell.astype("int32"),
                "pq_code": [c.tobytes() for c in codes],
            })

    out_t = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {out_t}, cell int, pq_code binary")


def ivfpq_topk(
    queries: DataFrame,
    base_codes: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    query_id: str = "q_id",
    base_id: str = "b_id",
    vec_col: str = "embedding",
    max_queries: int = 10_000,
    rerank: int = 0,
    rerank_base: DataFrame | None = None,
) -> DataFrame:
    """(q_id, b_id, dist, rank): each query probes its ``nprobe`` nearest
    cells; within a probed cell the PQ-approximated distance is
    ||q − centroid[cell]||-style ADC over the residual codes — the LUT for
    (query, cell) is built from q − centroid[cell], so distances are exact
    whenever residuals lie on the codebook grid. The codes table is
    scanned once with NO shuffle (cells a batch doesn't hold cost one mask
    each); per-batch deterministic top-k per query, global window rank.
    ``nprobe == n_cells`` degrades to pq_topk-quality over the full base —
    the correctness crosscheck. ``rerank``/``rerank_base`` as in pq_topk.
    ``max_queries`` chunks a larger query side internally exactly like
    pq_topk (per-chunk broadcast bound — enforced by per-chunk
    materialize + broadcast destroy when ≥2 chunks — one codes scan per
    chunk; empty query side → empty result).
    """
    def chunk(qrows):
        return _ivfpq_topk_chunk(
            qrows, base_codes, centroids, codebooks, k=k, nprobe=nprobe,
            query_id=query_id, base_id=base_id, vec_col=vec_col,
            rerank=rerank, rerank_base=rerank_base,
            query_schema=queries.schema)

    return _chunked_query_topk(
        queries, base_codes, query_id, vec_col, base_id, max_queries, chunk)


def _ivfpq_topk_chunk(
    qrows: list,
    base_codes: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int,
    nprobe: int,
    query_id: str,
    base_id: str,
    vec_col: str,
    rerank: int,
    rerank_base: DataFrame | None,
    query_schema,
) -> tuple:
    """(result DataFrame, the chunk's driver broadcast) for ≤ max_queries
    collected query rows; the caller owns the broadcast's lifecycle."""
    m, ksub, dsub = codebooks.shape
    n_cells = len(centroids)
    nprobe = min(int(nprobe), n_cells)
    qids = [r[query_id] for r in qrows]
    qv = np.asarray([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    qc = -2.0 * qv @ centroids.T + (centroids * centroids).sum(axis=1)[None, :]
    # deterministic nprobe cells per query (stable sort: ties by cell idx)
    probe = np.argsort(qc, axis=1, kind="stable")[:, :nprobe]
    # LUT per (query, probed cell): ||(q − cent[c])_j − R[j, code]||²
    bn = (codebooks * codebooks).sum(axis=2)
    luts: dict[int, list[tuple[int, np.ndarray]]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            r = qv[qi] - centroids[c]
            t = np.empty((m, ksub))
            for j in range(m):
                rj = r[j * dsub:(j + 1) * dsub]
                t[j] = (rj @ rj) - 2.0 * codebooks[j] @ rj + bn[j]
            luts.setdefault(int(c), []).append((qi, t))
    spark = base_codes.sparkSession
    bc = spark.sparkContext.broadcast((qids, luts))
    jidx = np.arange(m)
    keep = max(int(rerank), k) if rerank else k
    if rerank and rerank_base is None:
        raise ValueError("rerank needs rerank_base (the raw-vector table)")

    def gen(batches):
        import pandas as pd

        q_ids, tabs = bc.value
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"]), dtype=np.uint8).reshape(n, m)
            cells = pdf["cell"].to_numpy()
            bids = pdf[base_id].to_numpy()
            out_q, out_b, out_d = [], [], []
            for c in np.unique(cells):
                hits = tabs.get(int(c))
                if not hits:
                    continue
                sel = cells == c
                sub_codes, sub_bids = codes[sel], bids[sel]
                for qi, t in hits:
                    d = t[jidx[None, :], sub_codes].sum(axis=1)
                    top = np.lexsort((sub_bids, d))[: keep + 1]
                    out_q.extend([q_ids[qi]] * len(top))
                    out_b.extend(sub_bids[top].tolist())
                    out_d.extend(d[top].tolist())
            yield pd.DataFrame({query_id: out_q, base_id: out_b, "dist": out_d})

    qt = query_schema[query_id].dataType.simpleString()
    bt = base_codes.schema[base_id].dataType.simpleString()
    cand = base_codes.select(base_id, "cell", "pq_code").mapInPandas(
        gen, schema=f"{query_id} {qt}, {base_id} {bt}, dist double")
    w = Window.partitionBy(query_id).orderBy(F.asc("dist"), F.asc(base_id))
    ranked = (
        cand.filter(F.col(query_id) != F.col(base_id))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= keep)
    )
    if rerank:
        qdf = spark.createDataFrame(
            [(qid, v.tolist()) for qid, v in zip(qids, qv)],
            f"{query_id} {qt}, __qv array<double>",
        )
        bv = rerank_base.select(
            F.col(base_id), F.col(vec_col).cast("array<double>").alias("__bv"))
        exact = (
            bv.join(F.broadcast(ranked.drop("dist", "rank")), base_id)
            .join(F.broadcast(qdf), query_id)
            .withColumn("dist", F.aggregate(
                F.zip_with("__qv", "__bv", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda a, x: a + x))
        )
        ranked = (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    else:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select(
        query_id, base_id, (F.round("dist", 6) + 0.0).alias("dist"), "rank"), bc


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

"""Product quantization: fit / encode / ADC top-k.

Known-answer scheme in the repo's style: when every base vector lies
exactly ON the codebook grid (each subvector IS a centroid), PQ distance
equals exact distance, so pq_topk must equal brute-force L2 top-k row for
row. On clustered Gaussians the recall@k floor is gated. Encoding and
search are partitioning-invariant (deterministic tie-breaks).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_log_detector_spark.operators.knn import (
    brute_force_topk,
    pq_encode,
    pq_fit,
    pq_topk,
)

DIM, M, KSUB = 16, 4, 16
DSUB = DIM // M


def _grid_corpus(rng, n):
    """Vectors whose subvectors are drawn FROM a fixed centroid set — PQ
    reconstruction is exact, so ADC distances are exact distances."""
    cents = rng.standard_normal((M, KSUB, DSUB))
    picks = rng.integers(0, KSUB, size=(n, M))
    vecs = np.concatenate(
        [cents[j, picks[:, j]] for j in range(M)], axis=1)
    return cents, vecs


@pytest.fixture(scope="module")
def grid(spark):
    rng = np.random.default_rng(11)
    cents, vecs = _grid_corpus(rng, 400)
    df = spark.createDataFrame(
        [(f"v{i:04d}", v.tolist()) for i, v in enumerate(vecs)],
        "vec_id string, embedding array<double>",
    ).cache()
    df.count()
    yield cents, df
    df.unpersist()


def test_exact_on_codebook_grid(grid):
    cents, df = grid
    codes = pq_encode(df, cents)
    got = pq_topk(
        df.limit(20).select(F.col("vec_id").alias("q_id"), "embedding"),
        codes, cents, k=5, base_id="vec_id",
    ).collect()
    want = brute_force_topk(
        df.limit(20).select(F.col("vec_id").alias("q_id"), "embedding"),
        df, k=5, base_id="vec_id", metric="l2",
    ).collect()
    g = {(r["q_id"], r["rank"]): r["vec_id"] for r in got}
    w = {(r["q_id"], r["rank"]): r["vec_id"] for r in want}
    assert g == w
    # and the ADC distance is the true squared L2 (brute force reports
    # -sqrt(d); check one pair numerically)
    gd = {(r["q_id"], r["vec_id"]): r["dist"] for r in got}
    wd = {(r["q_id"], r["vec_id"]): r["score"] for r in want}
    for key, d in gd.items():
        assert abs(np.sqrt(max(d, 0.0)) + wd[key]) < 1e-4


def test_fit_encode_roundtrip_is_deterministic(grid, spark):
    _, df = grid
    cb1 = pq_fit(df, m=M, ksub=8, seed=3)
    cb2 = pq_fit(df.repartition(7), m=M, ksub=8, seed=3)
    # limit() over different partitionings can pick different training
    # prefixes; pin determinism on the SAME frame instead
    assert np.array_equal(cb1, pq_fit(df, m=M, ksub=8, seed=3))
    c1 = pq_encode(df, cb1).orderBy("vec_id").collect()
    c1b = pq_encode(df.repartition(5), cb1).orderBy("vec_id").collect()
    assert [(r["vec_id"], bytes(r["pq_code"])) for r in c1] == \
        [(r["vec_id"], bytes(r["pq_code"])) for r in c1b]
    assert all(len(bytes(r["pq_code"])) == M for r in c1)
    assert cb2.shape == (M, 8, DSUB)


def test_recall_on_clustered_corpus(spark):
    """20 well-separated Gaussian clusters. Pure ADC cannot rank WITHIN a
    code cell (cluster-mates share a code), so the honest gates are:
    (a) ADC top-k stays inside the right cluster, and (b) with exact
    re-ranking of the top-50 ADC candidates, recall@5 vs brute force is
    high. Ids encode the cluster (c{cc}_{i}) so (a) is checkable."""
    rng = np.random.default_rng(5)
    centers = 10.0 * rng.standard_normal((20, DIM))
    vecs = np.concatenate([
        centers[c] + 0.3 * rng.standard_normal((50, DIM)) for c in range(20)
    ])
    ids = [f"c{i // 50:02d}_{i % 50:02d}" for i in range(len(vecs))]
    df = spark.createDataFrame(
        [(vid, v.tolist()) for vid, v in zip(ids, vecs)],
        "vec_id string, embedding array<double>",
    )
    cb = pq_fit(df, m=M, ksub=32, seed=7)
    codes = pq_encode(df, cb).cache()
    q = df.limit(25).select(F.col("vec_id").alias("q_id"), "embedding")
    adc = pq_topk(q, codes, cb, k=5, base_id="vec_id").collect()
    same_cluster = np.mean(
        [r["q_id"][:3] == r["vec_id"][:3] for r in adc])
    assert same_cluster >= 0.95

    got = pq_topk(q, codes, cb, k=5, base_id="vec_id",
                  rerank=50, rerank_base=df).collect()
    want = brute_force_topk(q, df, k=5, base_id="vec_id", metric="l2").collect()
    g: dict[str, set] = {}
    for r in got:
        g.setdefault(r["q_id"], set()).add(r["vec_id"])
    w: dict[str, set] = {}
    for r in want:
        w.setdefault(r["q_id"], set()).add(r["vec_id"])
    recall = np.mean([len(g[qid] & w[qid]) / len(w[qid]) for qid in w])
    codes.unpersist()
    assert recall >= 0.95


def test_search_partitioning_invariant(grid):
    cents, df = grid
    codes = pq_encode(df, cents)
    q = df.limit(10).select(F.col("vec_id").alias("q_id"), "embedding")
    a = pq_topk(q, codes, cents, k=3, base_id="vec_id").collect()
    b = pq_topk(q, codes.repartition(11), cents, k=3, base_id="vec_id").collect()
    key = lambda r: (r["q_id"], r["rank"])  # noqa: E731
    assert sorted([tuple(r) for r in a], key=lambda t: (t[0], t[3])) == \
        sorted([tuple(r) for r in b], key=lambda t: (t[0], t[3]))


def test_query_chunking_equals_manual_shards(grid, spark):
    # Round-5 verdict item 5: a query side 3x over max_queries is chunked
    # internally (per-chunk broadcast bound intact) and must return
    # exactly what three manual shards return.
    cents, df = grid
    codes = pq_encode(df, cents)
    q = df.limit(30).select(F.col("vec_id").alias("q_id"), "embedding")
    got = pq_topk(q, codes, cents, k=3, base_id="vec_id",
                  max_queries=10).collect()
    shards = q.collect()
    want = []
    for s in range(0, 30, 10):
        shard = spark.createDataFrame(
            shards[s:s + 10], "q_id string, embedding array<double>")
        want += pq_topk(shard, codes, cents, k=3, base_id="vec_id",
                        max_queries=10).collect()
    key = lambda r: (r["q_id"], r["rank"])
    assert sorted(((r["q_id"], r["rank"], r["vec_id"], r["dist"])
                   for r in got)) == \
           sorted(((r["q_id"], r["rank"], r["vec_id"], r["dist"])
                   for r in want))
    assert len({r["q_id"] for r in got}) == 30


def test_query_chunking_with_rerank(grid, spark):
    cents, df = grid
    codes = pq_encode(df, cents)
    q = df.limit(25).select(F.col("vec_id").alias("q_id"), "embedding")
    whole = pq_topk(q, codes, cents, k=3, base_id="vec_id",
                    rerank=8, rerank_base=df).collect()
    chunked = pq_topk(q, codes, cents, k=3, base_id="vec_id",
                      rerank=8, rerank_base=df, max_queries=7).collect()
    canon = lambda rows: sorted(
        (r["q_id"], r["rank"], r["vec_id"], round(r["dist"], 6))
        for r in rows)
    assert canon(whole) == canon(chunked)


# ------------------------------------------------------------------ IVF-PQ


@pytest.fixture(scope="module")
def ivfpq_grid(spark):
    """Vectors = cell_centroid + residual drawn FROM the residual
    codebooks, with cells far apart vs residual size — so (a) every vector
    assigns to its intended cell and (b) residual PQ reconstruction is
    exact, making full-probe IVF-PQ distances EXACT."""
    from semantic_log_detector_spark.operators.knn import _kmeans_np  # noqa: F401

    rng = np.random.default_rng(21)
    n_cells = 6
    cents = 50.0 * rng.standard_normal((n_cells, DIM))
    books = 0.5 * rng.standard_normal((M, KSUB, DSUB))
    cell_pick = rng.integers(0, n_cells, size=500)
    code_pick = rng.integers(0, KSUB, size=(500, M))
    resid = np.concatenate(
        [books[j, code_pick[:, j]] for j in range(M)], axis=1)
    vecs = cents[cell_pick] + resid
    df = spark.createDataFrame(
        [(f"v{i:04d}", v.tolist()) for i, v in enumerate(vecs)],
        "vec_id string, embedding array<double>",
    ).cache()
    df.count()
    yield cents, books, df
    df.unpersist()


def test_ivfpq_full_probe_exact_on_grid(ivfpq_grid):
    from semantic_log_detector_spark.operators.knn import (
        ivfpq_encode,
        ivfpq_topk,
    )

    cents, books, df = ivfpq_grid
    codes = ivfpq_encode(df, cents, books, id_col="vec_id")
    q = df.limit(15).select(F.col("vec_id").alias("q_id"), "embedding")
    got = ivfpq_topk(q, codes, cents, books, k=5, nprobe=len(cents),
                     base_id="vec_id").collect()
    want = brute_force_topk(q, df, k=5, base_id="vec_id", metric="l2").collect()
    g = {(r["q_id"], r["rank"]): r["vec_id"] for r in got}
    w = {(r["q_id"], r["rank"]): r["vec_id"] for r in want}
    assert g == w


def test_ivfpq_partial_probe_and_fit(spark):
    """Trained end-to-end on clustered data: nprobe=2 of 8 cells plus
    exact re-rank recovers brute-force top-5 on nearly every query (a
    query's true neighbors share its cluster ⇒ its nearest cell)."""
    from semantic_log_detector_spark.operators.knn import (
        ivfpq_encode,
        ivfpq_fit,
        ivfpq_topk,
    )

    rng = np.random.default_rng(13)
    centers = 20.0 * rng.standard_normal((8, DIM))
    vecs = np.concatenate([
        centers[c] + 0.4 * rng.standard_normal((60, DIM)) for c in range(8)
    ])
    df = spark.createDataFrame(
        [(f"v{i:04d}", v.tolist()) for i, v in enumerate(vecs)],
        "vec_id string, embedding array<double>",
    ).cache()
    df.count()
    cents, books = ivfpq_fit(df, n_cells=8, m=M, ksub=32, seed=5)
    codes = ivfpq_encode(df, cents, books, id_col="vec_id").cache()
    q = df.limit(20).select(F.col("vec_id").alias("q_id"), "embedding")
    got = ivfpq_topk(q, codes, cents, books, k=5, nprobe=2,
                     base_id="vec_id", rerank=40, rerank_base=df).collect()
    want = brute_force_topk(q, df, k=5, base_id="vec_id", metric="l2").collect()
    g: dict[str, set] = {}
    for r in got:
        g.setdefault(r["q_id"], set()).add(r["vec_id"])
    w: dict[str, set] = {}
    for r in want:
        w.setdefault(r["q_id"], set()).add(r["vec_id"])
    recall = np.mean([len(g[qid] & w[qid]) / len(w[qid]) for qid in w])
    codes.unpersist()
    df.unpersist()
    assert recall >= 0.9


def test_ivfpq_partitioning_invariant(ivfpq_grid):
    from semantic_log_detector_spark.operators.knn import (
        ivfpq_encode,
        ivfpq_topk,
    )

    cents, books, df = ivfpq_grid
    codes = ivfpq_encode(df, cents, books, id_col="vec_id")
    q = df.limit(8).select(F.col("vec_id").alias("q_id"), "embedding")
    a = ivfpq_topk(q, codes, cents, books, k=3, nprobe=2, base_id="vec_id").collect()
    b = ivfpq_topk(q, codes.repartition(13), cents, books, k=3, nprobe=2,
                   base_id="vec_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivfpq_query_chunking(ivfpq_grid, spark):
    from semantic_log_detector_spark.operators.knn import (
        ivfpq_encode,
        ivfpq_topk,
    )

    cents, cbs, df = ivfpq_grid
    codes = ivfpq_encode(df, cents, cbs)
    q = df.limit(21).select(F.col("vec_id").alias("q_id"), "embedding")
    whole = ivfpq_topk(q, codes, cents, cbs, k=3, nprobe=len(cents),
                       base_id="vec_id").collect()
    chunked = ivfpq_topk(q, codes, cents, cbs, k=3, nprobe=len(cents),
                         base_id="vec_id", max_queries=8).collect()
    canon = lambda rows: sorted(
        (r["q_id"], r["rank"], r["vec_id"], round(r["dist"], 6))
        for r in rows)
    assert canon(whole) == canon(chunked)


def test_pq_fit_tiny_increment_shrinks_ksub(spark):
    # a first increment smaller than ksub must not crash ingest (found
    # live: CLI --ann-index default ksub=256 on a 60-clip first feed blew
    # up in _kmeans_np); the codebook shrinks to the data and the index
    # still serves exact self-retrieval
    import warnings

    import numpy as np

    from semantic_log_detector_spark.operators.knn import (
        pq_encode, pq_fit, pq_topk)

    rng = np.random.default_rng(7)
    vecs = [(f"v{i}", rng.standard_normal(16).tolist()) for i in range(10)]
    base = spark.createDataFrame(vecs, "vec_id string, embedding array<double>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cb = pq_fit(base, m=4, ksub=256, seed=1)
    assert any("shrinking ksub" in str(x.message) for x in w)
    assert cb.shape == (4, 10, 4)
    codes = pq_encode(base, cb)
    assert codes.count() == 10
    q = spark.createDataFrame([("q0", vecs[3][1])],
                              "q_id string, embedding array<double>")
    top = pq_topk(q, codes, cb, k=1, base_id="vec_id").collect()
    assert top and top[0]["vec_id"] == "v3"


def test_empty_query_side_returns_empty(grid, spark):
    # a dynamically-empty query batch (e.g. no new clips matched a
    # filter) yields zero matches, not an error
    cents, df = grid
    codes = pq_encode(df, cents)
    q = df.filter("vec_id = '__nope__'") \
          .select(F.col("vec_id").alias("q_id"), "embedding")
    got = pq_topk(q, codes, cents, k=3, base_id="vec_id")
    assert got.columns == ["q_id", "vec_id", "dist", "rank"]
    assert got.count() == 0

"""Round-5 verdict item 7: power-law (Zipf) stress for the connected-
components and vocabulary heavy-hitter paths.

The scale claims under test, made empirical instead of prose:

- ``token_frequencies``: a token held by ~10% of all rows must NOT become
  a reducer straggler. n_occurrences is a plain partial-aggregated count
  (the heavy token ships one partial per map task); n_docs plans as
  Expand + two-level aggregate whose first shuffle keys on (token, id) —
  the heavy token's pairs spread across reducers by id.
- ``dup_clusters``: a star component whose hub touches ~10% of all nodes
  concentrates the edge join on one key; map-side min-combine bounds the
  groupBy side and AQE skew handling splits the join side. Pointer
  jumping keeps rounds at O(log diameter) even for the hub component.

Both are gated on correctness AND a generous wall-clock ratio vs a
uniform same-size run (10x — a true straggler collapse is 30-100x on 32
cores), plus the plan shape that makes the bound hold (partial
aggregation before the exchange)."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

N_DOCS = 20_000


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


@pytest.fixture(scope="module")
def zipf_docs(spark):
    # ~12 tokens per doc, ranks Zipf(s=1.2) over a 5k vocab; rank-0 token
    # additionally planted in EVERY doc => >10% of all occurrences
    rng = np.random.default_rng(17)
    ranks = rng.zipf(1.2, size=(N_DOCS, 11)).clip(1, 5000)
    rows = [
        (f"d{i:06d}", "tok0000 " + " ".join(f"tok{r:04d}" for r in ranks[i]))
        for i in range(N_DOCS)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string") \
        .repartition(32).cache()
    df.count()
    yield df
    df.unpersist()


def test_token_frequencies_zipf_correct_and_partial_agged(spark, zipf_docs):
    from semantic_log_detector_spark.operators.textstats import (
        token_frequencies,
    )

    tf = token_frequencies(zipf_docs)
    plan = _plan(tf)
    # the count aggregate must partial-combine BEFORE the exchange — the
    # device that bounds the heavy token's reducer input by the task count
    assert plan.count("HashAggregate") >= 2, plan
    rows = {r["token"]: r for r in tf.collect()}
    heavy = rows["tok0000"]
    assert heavy["n_docs"] == N_DOCS              # planted in every doc
    assert heavy["n_occurrences"] >= N_DOCS       # plus Zipf draws
    total = sum(r["n_occurrences"] for r in rows.values())
    assert heavy["n_occurrences"] / total > 0.08  # genuinely heavy


def test_token_frequencies_zipf_no_straggler(spark, zipf_docs):
    from semantic_log_detector_spark.operators.textstats import (
        token_frequencies,
    )

    # uniform control: same row count, same tokens-per-doc, flat vocab
    rng = np.random.default_rng(18)
    flat = rng.integers(0, 5000, size=(N_DOCS, 12))
    ctl = spark.createDataFrame(
        [(f"d{i:06d}", " ".join(f"tok{r:04d}" for r in flat[i]))
         for i in range(N_DOCS)],
        "doc_id string, text string").repartition(32).cache()
    ctl.count()
    t0 = time.monotonic()
    token_frequencies(ctl).count()
    t_uniform = time.monotonic() - t0
    t0 = time.monotonic()
    token_frequencies(zipf_docs).count()
    t_zipf = time.monotonic() - t0
    ctl.unpersist()
    # straggler collapse would be ~#cores x; allow 10x for host noise
    assert t_zipf < 10 * max(t_uniform, 0.2), (t_zipf, t_uniform)


def test_dup_clusters_star_hub_10pct(spark):
    from semantic_log_detector_spark.operators.dedup import dup_clusters

    n = 30_000
    hub_spokes = 3_000  # hub touches 10% of all nodes
    edges = [("hub", f"s{i:05d}") for i in range(hub_spokes)]
    # plus many 2-node components as background
    edges += [(f"a{i:05d}", f"b{i:05d}")
              for i in range((n - hub_spokes - 1) // 2)]
    pairs = spark.createDataFrame(edges, "id_a string, id_b string") \
        .repartition(32)
    stats: dict = {}
    t0 = time.monotonic()
    # max_local_edges=0: the skew claim under test is the DISTRIBUTED
    # loop's (the round-6 local fast path would absorb this graph)
    cl = dup_clusters(pairs, drop_stats=stats, max_local_edges=0)
    got = cl.filter(F.col("cluster_id") == "hub")
    n_hub = got.count()
    wall = time.monotonic() - t0
    assert n_hub == hub_spokes + 1
    sizes = {r["cluster_size"] for r in got.limit(5).collect()}
    assert sizes == {hub_spokes + 1}
    # a star has diameter 2: pointer jumping must converge in a handful
    # of rounds regardless of hub degree
    assert stats["cc_iterations"] <= 4, stats
    assert wall < 120, f"hub CC took {wall:.0f}s — skew straggler"


def test_dup_clusters_chain_logarithmic_rounds(spark):
    from semantic_log_detector_spark.operators.dedup import dup_clusters

    # a 4000-node chain: diameter 3999 >> 25 rounds — only the pointer
    # jump's O(log d) convergence makes this terminate
    edges = [(f"n{i:05d}", f"n{i + 1:05d}") for i in range(3999)]
    stats: dict = {}
    cl = dup_clusters(
        spark.createDataFrame(edges, "id_a string, id_b string"),
        drop_stats=stats, max_local_edges=0)
    assert cl.select("cluster_id").distinct().count() == 1
    assert stats["cc_iterations"] <= 14, stats  # ~log2(4000) + slack

"""Bigram-LM perplexity filter: hand-computed known answer + the
behavior that justifies it (order-scrambled and OOV text score worse
than in-distribution text, which char-level quality_score cannot see)."""

import math

import pytest

from semantic_log_detector_spark.operators.textstats import (
    lm_perplexity,
    train_bigram_lm,
)

LAM, K = 0.75, 1.0


@pytest.fixture(scope="module")
def lm(spark):
    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)]
        + [(100 + i, "the dog sat on the rug") for i in range(10)],
        "doc_id long, text string",
    )
    bigrams, unigrams, stats = train_bigram_lm(corpus)
    return bigrams.cache(), unigrams.cache(), stats


def _p(n12, n1, n2, v, n_tot):
    big = (n12 / n1) if n1 else 0.0
    return LAM * big + (1 - LAM) * (n2 + K) / (n_tot + K * v)


def test_known_answer_by_hand(spark, lm):
    bigrams, unigrams, stats = lm
    # vocab: the cat sat on mat dog rug = 7; 20 docs × 6 tokens = 120
    assert stats == {"vocab_size": 7, "total_tokens": 120}
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "x y")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           lm_perplexity(docs, bigrams, unigrams, stats).collect()}
    # counts: "the cat"=10 (n1 the=40, n2 cat=10); "cat sat"=10 (n1
    # cat=10, n2 sat=20)
    lp = (math.log(_p(10, 40, 10, 7, 120))
          + math.log(_p(10, 10, 20, 7, 120))) / 2
    assert got[1]["n_bigrams"] == 2
    assert abs(got[1]["avg_logp"] - round(lp, 6)) < 1e-6
    assert abs(got[1]["ppl"] - round(math.exp(-lp), 6)) < 1e-4
    # fully OOV pair: bigram term 0, unigram floor only
    lp2 = math.log(_p(0, 0, 0, 7, 120))
    assert abs(got[2]["avg_logp"] - round(lp2, 6)) < 1e-6


def test_order_and_oov_rank_worse(spark, lm):
    bigrams, unigrams, stats = lm
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),   # in-distribution
            (2, "mat the on sat cat the"),   # same tokens, scrambled
            (3, "zq xv wp lk jh gf"),        # OOV junk
        ],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"] for r in
           lm_perplexity(docs, bigrams, unigrams, stats).collect()}
    assert ppl[1] < ppl[2] < ppl[3]


def test_short_docs_keep_rows_with_null_scores(spark, lm):
    bigrams, unigrams, stats = lm
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            lm_perplexity(docs, bigrams, unigrams, stats).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(r["n_bigrams"] == 0 and r["ppl"] is None
               for r in rows.values())


def test_curation_ppl_gate(spark):
    """curate_documents(max_ppl=...) drops the scrambled doc and keeps
    the clean twins (ppl ~2.5 vs ~14.5); unscoreable docs survive."""
    from pyspark.sql import functions as F

    from semantic_log_detector_spark.operators.curate import curate_documents

    base = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, base + f" extra{i}") for i in range(20)]
    rows.append((900, "rug the and mat dog the on sat sat cat on the the"))
    rows.append((901, "word"))  # unscoreable: no bigrams
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kept_ids = {
        r["id"] for r in curate_documents(
            docs, langs=(), min_quality=0.0, max_ppl=8.0).collect()
    }
    no_gate = {
        r["id"] for r in curate_documents(
            docs, langs=(), min_quality=0.0).collect()
    }
    assert 900 in no_gate
    assert 900 not in kept_ids          # scrambled order gated out
    assert 901 in kept_ids              # unscoreable short doc survives
    assert len(kept_ids) >= len(no_gate) - 2

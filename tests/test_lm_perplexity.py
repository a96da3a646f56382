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

"""vocab_psi: per-group token-distribution drift vs the corpus."""

from pyspark.sql import functions as F

from semantic_log_detector_spark.operators.textstats import vocab_psi


def _docs(spark):
    """Three groups: a/b share one vocabulary (different doc counts),
    c writes from a disjoint vocabulary — planted text drift."""
    common = "the quick brown fox jumps over the lazy dog near the river"
    shifted = "quantum flux capacitor entangles superconducting qubit arrays"
    rows = (
        [(f"a{i}", "a", common) for i in range(40)]
        + [(f"b{i}", "b", common) for i in range(20)]
        + [(f"c{i}", "c", shifted) for i in range(30)]
    )
    return spark.createDataFrame(rows, "doc_id string, lang string, text string")


def test_shifted_vocabulary_scores_high(spark):
    out = {r["lang"]: r for r in vocab_psi(
        _docs(spark), text_col="text", group_col="lang").collect()}
    assert set(out) == {"a", "b", "c"}
    # a and b share one token distribution (PSI differs only through the
    # size-dependent smoothing term); the disjoint vocabulary dominates
    assert abs(out["a"]["vocab_psi"] - out["b"]["vocab_psi"]) < 0.15
    assert out["c"]["vocab_psi"] > 3 * max(out["a"]["vocab_psi"],
                                           out["b"]["vocab_psi"])
    assert out["c"]["vocab_psi"] > 2.0
    # token accounting: 'common' has 12 tokens, 'shifted' 7
    assert out["a"]["n_tokens"] == 40 * 12
    assert out["c"]["n_tokens"] == 30 * 7


def test_single_group_is_near_zero(spark):
    df = _docs(spark).filter("lang = 'a'")
    row = vocab_psi(df, text_col="text", group_col="lang").collect()[0]
    # the only group IS the corpus: PSI reduces to smoothing noise
    assert abs(row["vocab_psi"]) < 1e-6


def test_empty_and_whitespace_text_contribute_nothing(spark):
    base = _docs(spark)
    extra = spark.createDataFrame(
        [("x1", "a", ""), ("x2", "a", "   ")],
        "doc_id string, lang string, text string")
    with_junk = base.unionByName(extra)
    a = {r["lang"]: r["vocab_psi"] for r in vocab_psi(base).collect()}
    b = {r["lang"]: r["vocab_psi"] for r in vocab_psi(with_junk).collect()}
    assert a == b

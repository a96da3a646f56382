

def test_split_leakage_audit(spark):
    """Planted near-dup pairs crossing splits are reported with both split
    names; same-split pairs are not; unmapped ids surface as NULL (a
    finding, not a drop)."""
    from semantic_log_detector_spark.operators.splits import (
        split_leakage,
        split_leakage_summary,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("e", "f"), ("g", "zz")],
        "id_a string, id_b string",
    )
    splits = spark.createDataFrame(
        [("a", "train"), ("b", "test"), ("c", "train"), ("d", "train"),
         ("e", "val"), ("f", "train"), ("g", "train")],
        "id string, split string",
    )
    leaks = split_leakage(pairs, splits).collect()
    got = {(r["id_a"], r["id_b"]): (r["split_a"], r["split_b"]) for r in leaks}
    assert got == {
        ("a", "b"): ("train", "test"),
        ("e", "f"): ("val", "train"),
        ("g", "zz"): ("train", None),   # unmapped id = finding
    }
    summ = {
        (r["split_lo"], r["split_hi"]): r["n_pairs"]
        for r in split_leakage_summary(split_leakage(pairs, splits)).collect()
    }
    assert summ[("test", "train")] == 1 and summ[("train", "val")] == 1


def test_split_leakage_composes_with_dup_rung(spark):
    """End to end with a real dup rung: planted duplicate documents split
    across train/test are caught by minhash pairs -> leakage audit."""
    import pyspark.sql.functions as F

    from semantic_log_detector_spark.operators.dedup import minhash_lsh_pairs
    from semantic_log_detector_spark.operators.splits import (
        hash_split,
        split_leakage,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(f"d{i:03d}", base + f"unique tail {i} " + "filler words " * 6)
            for i in range(40)]
    # two exact near-dup pairs with distinct ids (hash_split will place
    # them independently -- we then FORCE them cross-split via explicit map)
    rows += [("dupA1", base * 4), ("dupA2", base * 4)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    stats = {}
    pairs = minhash_lsh_pairs(docs, id_col="doc_id", text_col="text",
                              jaccard_threshold=0.8, drop_stats=stats)
    splits = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") == "dupA1", "train")
         .when(F.col("doc_id") == "dupA2", "test")
         .otherwise(hash_split(F.col("doc_id"),
                               {"train": 0.8, "test": 0.2})).alias("split"),
    )
    leaked = split_leakage(pairs, splits)
    crossed = {(r["id_a"], r["id_b"]) for r in leaked.collect()}
    assert ("dupA1", "dupA2") in crossed or ("dupA2", "dupA1") in crossed
    from semantic_log_detector_spark.operators.dedup import unpersist_all
    unpersist_all(stats)

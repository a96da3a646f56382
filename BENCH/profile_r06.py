"""Round-6 stage-level profiling of the dedup/curation trio (guide §1).

Times sub-plans of q22/q33/q43/curation_lsh with the noop sink so the
expensive stage is identified before anything is changed. Run AFTER the
baseline bench (same session conf as bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def t(label, df, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(json.dumps({"stage": label, "best": round(best, 3)}))
    return best


def main():
    from semantic_log_detector_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="profile_r06", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from semantic_log_detector_spark.operators.dedup import (
        dup_clusters,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        shingle_hashes,
        token_shingles,
    )
    from semantic_log_detector_spark.operators.textstats import (
        lang_id,
        quality_score,
        token_count,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm JVM / python workers
    t("warm_count", d.select("doc_id"))

    # --- q22 exact path stages
    sh = d.select(
        F.col("doc_id").alias("id"),
        token_shingles(F.col("text"), 3).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    t("q22.shingles_only", sh)
    inv = (
        sh.select("id", "n_sh", F.explode("sh").alias("s_str"))
        .select("id", "n_sh", F.xxhash64("s_str").alias("s"))
    )
    t("q22.inverted_index", inv)
    t("q22.full", ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3,
                                      threshold=0.03, max_df=None))

    # --- minhash/LSH stages
    base = d.select(
        F.col("doc_id").alias("id"),
        shingle_hashes(F.col("text"), 3).alias("sh"),
    ).filter(F.size("sh") > 0)
    t("lsh.shingle_hashes", base)
    t("lsh.full_pairs", minhash_lsh_pairs(d, "text", "doc_id",
                                          jaccard_threshold=0.2))

    # --- q33 full
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    t("q33.full", qs["q33_minhash_pairs"](spark, sf_dir))

    # --- q43 decomposition
    stats = d.select(
        F.col("doc_id").alias("id"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_guess"),
    )
    t("q43.stats_only", stats)
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", shingle_n=3,
                                threshold=0.03, max_df=None)
    t0 = time.time()
    cl = dup_clusters(pairs)
    cl.write.format("noop").mode("overwrite").save()
    print(json.dumps({"stage": "q43.pairs_plus_cc", "best": round(time.time() - t0, 3)}))
    t("q43.full", qs["q43_training_selection"](spark, sf_dir))

    # --- curation_lsh decomposition
    from semantic_log_detector_spark.operators.curate import (
        curate_documents, curation_summary,
    )

    lsh_pairs = minhash_lsh_pairs(d, "text", "doc_id", jaccard_threshold=0.5)
    t0 = time.time()
    cl2 = dup_clusters(lsh_pairs)
    cl2.write.format("noop").mode("overwrite").save()
    print(json.dumps({"stage": "curation.lsh_pairs_plus_cc", "best": round(time.time() - t0, 3)}))
    t0 = time.time()
    kept = curate_documents(d, langs=("en",), min_quality=0.5,
                            jaccard_threshold=0.5, exact_pairs=False)
    curation_summary(kept).write.format("noop").mode("overwrite").save()
    print(json.dumps({"stage": "curation.full", "best": round(time.time() - t0, 3)}))

    spark.stop()


if __name__ == "__main__":
    main()

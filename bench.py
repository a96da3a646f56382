"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the full clips
validation suite (the north metric: validated clips/sec, all checks
enabled) on a materialized synthetic clip table. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "clips_per_sec": ..., "n_clips": ...}

The clip table is materialized to a cache dir once (fixture generation is
not engine time) and read back as parquet — the realistic input path.

NB (round 2): q33_minhash_pairs now times the VALIDATED near-dup query —
MinHash-LSH plus the exact-Jaccard baseline it is checked against — so its
wall is exact + LSH, not LSH alone (roughly q22 + old-q33). The north
metric (validated clips/sec) is unaffected.

NB (round 3): q43_training_selection times the exact-pair-graph curation
(the CORRECTNESS path its oracle replays); `curation_lsh` times the same
end-to-end curation through MinHash-LSH — the path a 100 TB corpus
actually runs — so the scale path is measured, not just the verification
path. `audio_dedup_20k` (round 3) times the acoustic dedup rung end-to-end
(decode + fingerprint + pigeonhole join over 20k clips); total `value`
grows accordingly — the cross-round comparable is `clips_per_sec`.

NB (round 4): `pq_search_200k` times the product-quantization search
path — ADC top-k + exact re-rank over persisted m-byte codes of a
200k-vector clustered corpus. Fit and encode are untimed one-time index
builds (codes persist next to the table), cached like the other
fixtures.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q01_pricing_summary",
    "q02_nation_revenue",
    "q07_set_ops",  # round 4: absorbed q06_distinct_parts (same agg shape)
    "q08_window_scalars",  # round 5: absorbed q12_zscore_window
    "q18_threshold_metrics",  # round 5: absorbed q19_best_threshold
    "q22_ngram_jaccard",
    "q23_embedding_topk",
    "q25_textstats",
    "q28_stats_profile",
    "q33_minhash_pairs",
    "q43_training_selection",
]


def materialize_clips(spark, n: int, seed: int = 42, cache_root: str = "/tmp/sld_bench_cache"):
    from semantic_log_detector_spark.sources.synth import clips_table, transcripts_table

    cdir = f"{cache_root}/clips_{n}_{seed}"
    tdir = f"{cache_root}/transcripts_{n}_{seed}"
    for path, builder in ((cdir, lambda: clips_table(spark, n, seed=seed)),
                          (tdir, lambda: transcripts_table(spark, n, seed=seed))):
        if not (os.path.isdir(path) and any(f.endswith("parquet") for f in os.listdir(path))):
            builder().write.mode("overwrite").parquet(path)
    return cdir, tdir


def run_clips_suite(spark, cdir: str, tdir: str, out_dir: str) -> float:
    from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite

    clips = spark.read.parquet(cdir)
    transcripts = spark.read.parquet(tdir)
    t0 = time.time()
    run_suite(spark, clips, transcripts, out_dir, SuiteConfig(),
              input_fingerprint=cdir, clips_path=cdir)
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    n_clips = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", 60_000))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0

    # hardware calibration BEFORE the SparkSession exists: raw no-Spark
    # decode throughput at 1/32 processes (BENCH/scaling.py's burn kernel).
    # Measured pre-session because a live local[32] JVM contends with the
    # calibration pool and understates the host by 3-8x (observed 2,378
    # vs 18,833 clips/s minutes apart). The shared VM shows up to 3x
    # co-tenant swings; a calm host reads ~16,800+ clips/s at 32 procs, so
    # this field lets any recorded wall be interpreted against the host
    # state that produced it.
    from BENCH.scaling import calibrate as _hw_calibrate
    from BENCH.scaling import mem_bandwidth as _hw_bw

    cal = _hw_calibrate(seconds=2.0, levels=(1, 32))
    # memory-bus state too: the decode burn is cache-resident compute and
    # reads calm even when a co-tenant saturates DRAM, so record both.
    # Calm-host reference ~85 GB/s aggregate at 8 procs on this VM.
    bw = _hw_bw()

    from semantic_log_detector_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    # warm the JVM/readers once so q01 doesn't pay session startup
    qs["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):  # best-of-2 (additive host noise; see below)
            t0 = time.time()
            # noop sink materializes the full result without collect()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # the LSH SCALE path of the curation capstone (q43 times the exact
    # pair graph its oracle verifies; a 100 TB corpus runs MinHash-LSH)
    def curation_lsh():
        from semantic_log_detector_spark.operators.curate import (
            curate_documents, curation_summary,
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        kept = curate_documents(
            docs, langs=("en",), min_quality=0.5, jaccard_threshold=0.5,
            exact_pairs=False,
        )
        curation_summary(kept).write.format("noop").mode("overwrite").save()

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        curation_lsh()
        best = min(best, time.time() - t0)
    timings["curation_lsh"] = round(best, 3)

    # acoustic content dedup over a materialized 20k-clip corpus (decode +
    # melody fingerprint + exact Hamming-≤3 pigeonhole join — the payload
    # rung of the dedup ladder, q52's operator at bench scale)
    def audio_dedup_bench(corpus_dir):
        from semantic_log_detector_spark.operators.audio_dedup import audio_dup_pairs

        corpus = spark.read.parquet(corpus_dir)
        audio_dup_pairs(corpus).write.format("noop").mode("overwrite").save()

    n_dup = int(os.environ.get("SPARK_GRAFT_BENCH_DUP_CLIPS", 20_000))
    ddir = f"/tmp/sld_bench_cache/dupaudio_v2_{n_dup}_7"
    if not (os.path.isdir(ddir) and any(f.endswith("parquet") for f in os.listdir(ddir))):
        from semantic_log_detector_spark.sources.synth import content_dup_clips

        content_dup_clips(spark, n_dup, seed=7).write.mode("overwrite").parquet(ddir)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        audio_dedup_bench(ddir)
        best = min(best, time.time() - t0)
    timings["audio_dedup_20k"] = round(best, 3)

    # audio snippet search over a materialized 5k-clip / 11-hour melody
    # corpus: 20 re-encoded, non-grid-aligned snippet queries (16 planted,
    # 4 out-of-corpus). Times the full retrieval: corpus landmark pass
    # (decode + FFT, payloads stay in the scan stage) + broadcast join +
    # offset voting. Fixture prep (corpus materialization, snippet
    # cutting) is untimed — it is input generation, not engine time.
    n_mel = int(os.environ.get("SPARK_GRAFT_BENCH_MELODY_CLIPS", 5_000))
    mdir = f"/tmp/sld_bench_cache/melody_{n_mel}_3"
    if not (os.path.isdir(mdir) and any(f.endswith("parquet") for f in os.listdir(mdir))):
        from semantic_log_detector_spark.sources.synth import melody_clips

        melody_clips(spark, n_mel, seed=3).write.mode("overwrite").parquet(mdir)

    def snippet_queries(corpus_df):
        import numpy as np

        from semantic_log_detector_spark.functions.audio import (
            decode_clip, resample_linear,
        )
        from semantic_log_detector_spark.functions.g711 import encode_mulaw
        from semantic_log_detector_spark.sources.synth import melody_clips

        rows = corpus_df.filter("idx % 311 = 7").limit(16).collect()
        qs = []
        for j, r in enumerate(rows):
            pcm, sr = decode_clip(bytes(r["bytes"]), r["codec"])
            s0 = int((0.017 + 0.61 * (j % 9)) * sr)
            piece = resample_linear(pcm[s0 : s0 + 3 * sr], sr, 8000)
            qs.append((f"q{j}", encode_mulaw(piece.astype(np.float32), 8000), "mulaw"))
        for j, r in enumerate(melody_clips(spark, 4, seed=777).collect()):
            pcm, sr = decode_clip(bytes(r["bytes"]), r["codec"])
            piece = resample_linear(pcm[sr : 4 * sr], sr, 8000)
            qs.append((f"neg{j}", encode_mulaw(piece.astype(np.float32), 8000), "mulaw"))
        return spark.createDataFrame(qs, "clip_id string, bytes binary, codec string")

    def snippet_search_bench():
        from semantic_log_detector_spark.operators.audio_search import (
            audio_snippet_search,
        )

        corpus = spark.read.parquet(mdir)
        audio_snippet_search(corpus, qdf).write.format("noop").mode("overwrite").save()

    qdf = snippet_queries(spark.read.parquet(mdir))
    from pyspark.sql import functions as _F

    best = float("inf")
    for _ in range(2):
        # untimed page-cache warm of the payload column before EVERY rep
        # (~1 GB; the VM's cold disk reads ~65 MB/s and co-tenant memory
        # pressure can evict between reps — observed 3.7 s vs 51 s for the
        # same work depending on residency)
        spark.read.parquet(mdir).select(_F.sum(_F.length("bytes"))).collect()
        t0 = time.time()
        snippet_search_bench()
        best = min(best, time.time() - t0)
    timings["snippet_search_5k"] = round(best, 3)

    # PQ similarity search at corpus scale: bounded-sample fit + m-byte
    # encode + shuffle-free ADC top-k with exact re-rank, over a
    # materialized 200k × 64-d clustered embedding corpus (the sf tables
    # carry only 2k vectors — too small to exercise the rung). Codes are
    # 64× smaller than the raw vectors; fixture generation is untimed.
    n_pq = int(os.environ.get("SPARK_GRAFT_BENCH_PQ_VECS", 200_000))
    pdir = f"/tmp/sld_bench_cache/pqvecs_{n_pq}_11"
    if not (os.path.isdir(pdir) and any(f.endswith("parquet") for f in os.listdir(pdir))):
        import numpy as np

        def _gen_vecs(batches):
            import pandas as pd

            crng = np.random.Generator(np.random.Philox(key=11))
            centers = 10.0 * crng.standard_normal((64, 64))
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                out = []
                for i in ids:
                    r = np.random.Generator(np.random.Philox(key=int(i) + 1))
                    out.append((centers[int(i) % 64]
                                + 0.5 * r.standard_normal(64)).astype(np.float32))
                yield pd.DataFrame({"vec_id": ids, "embedding": out})

        spark.range(n_pq).repartition(32).mapInPandas(
            _gen_vecs, "vec_id long, embedding array<float>"
        ).write.mode("overwrite").parquet(pdir)

    # fit + encode are ONE-TIME index builds (codes persist next to the
    # table; FAISS trains offline the same way) — untimed setup, cached
    # like the other fixtures. The timed path is what a corpus pays per
    # query batch: ADC scan over the persisted codes + exact re-rank.
    from semantic_log_detector_spark.operators.knn import (
        pq_encode, pq_fit, pq_topk,
    )

    cb_path = f"{pdir}_codebooks.npy"
    codes_dir = f"{pdir}_codes"
    base = spark.read.parquet(pdir)
    if not os.path.exists(cb_path):
        import numpy as np

        np.save(cb_path, pq_fit(base, m=8, ksub=256, seed=11,
                                max_train_vectors=50_000, iters=10))
    import numpy as np

    cb = np.load(cb_path)
    if not (os.path.isdir(codes_dir)
            and any(f.endswith("parquet") for f in os.listdir(codes_dir))):
        pq_encode(base, cb, id_col="vec_id").write.mode("overwrite") \
            .parquet(codes_dir)

    def pq_bench():
        from pyspark.sql import functions as _F2

        codes = spark.read.parquet(codes_dir)
        q = base.limit(32).select(_F2.col("vec_id").alias("q_id"), "embedding")
        pq_topk(q, codes, cb, k=10, base_id="vec_id",
                rerank=100, rerank_base=base) \
            .write.format("noop").mode("overwrite").save()

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        pq_bench()
        best = min(best, time.time() - t0)
    timings["pq_search_200k"] = round(best, 3)

    # untimed warmup suite on a small table: first-run codegen + python
    # worker spawn + page-cache effects cost 3-5× the steady-state wall
    # (measured 105s -> 40s -> 19.5s across reps at 32 cores); steady-state
    # throughput is the metric, matching the BENCH/BASELINE.md protocol
    wcdir, wtdir = materialize_clips(spark, 2000)
    wout = tempfile.mkdtemp(prefix="sld_bench_warm_")
    try:
        run_clips_suite(spark, wcdir, wtdir, wout)
    finally:
        shutil.rmtree(wout, ignore_errors=True)

    # best-of-reps: this sandbox VM shows additive noise (steal spikes,
    # kernel-time inflation) up to 4x run-to-run at constant user-CPU work,
    # so the min over reps estimates the uncontended cost — the same
    # estimator BENCH/BASELINE.md documents and `python -m timeit` uses.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", 3))
    cdir, tdir = materialize_clips(spark, n_clips)
    suite_wall = float("inf")
    for _ in range(reps):
        out_dir = tempfile.mkdtemp(prefix="sld_bench_out_")
        try:
            suite_wall = min(suite_wall, run_clips_suite(spark, cdir, tdir, out_dir))
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    timings["clips_suite"] = round(suite_wall, 3)

    # feature-store throughput: MFCC frame-tensor export + corpus CMVN over
    # a ~10k-clip hash slice of the (page-warm, post-suite) bench corpus —
    # decode + framed FFT + DCT per clip, partial-aggregate CMVN on top
    def features_bench():
        from pyspark.sql import functions as _F

        from semantic_log_detector_spark.operators.features import (
            cmvn_stats, extract_features,
        )

        sl = spark.read.parquet(cdir).filter(
            _F.pmod(_F.xxhash64("clip_id"), _F.lit(6)) == 0)
        # single action: tensors stream through the scan stage, only the
        # clips × n_coeffs partials reach the CMVN agg
        cmvn_stats(extract_features(sl)).write.format("noop") \
            .mode("overwrite").save()

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        features_bench()
        best = min(best, time.time() - t0)
    timings["features_cmvn_10k"] = round(best, 3)

    # bit-packed FLAC decode throughput (round-5 full decoder): MFCC export
    # over a materialized 2k-clip FIXED+Rice corpus — times the _FrameBits
    # engine (prefix-count Rice walk) at corpus level; the suite above
    # exercises only the byte-aligned VERBATIM fast path
    def packed_flac_bench(corpus_dir):
        from semantic_log_detector_spark.operators.features import (
            cmvn_stats, extract_features,
        )

        corpus = spark.read.parquet(corpus_dir)
        cmvn_stats(extract_features(corpus)).write.format("noop") \
            .mode("overwrite").save()

    n_packed = int(os.environ.get("SPARK_GRAFT_BENCH_PACKED_CLIPS", 2_000))
    pdir = f"/tmp/sld_bench_cache/packedflac_v1_{n_packed}_7"
    if not (os.path.isdir(pdir) and any(f.endswith("parquet") for f in os.listdir(pdir))):
        from semantic_log_detector_spark.sources.synth import packed_flac_twin_clips

        (packed_flac_twin_clips(spark, n_packed, seed=7)
         .filter("layout = 'packed'")
         .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec")
         .write.mode("overwrite").parquet(pdir))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        packed_flac_bench(pdir)
        best = min(best, time.time() - t0)
    timings["flac_packed_decode_2k"] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline query suite + full clips validation wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_clips": n_clips,
        "clips_per_sec": round(n_clips / suite_wall, 1),
        "cpus": cpus,
        "hw_calibration_clips_per_sec": {str(k): v for k, v in cal.items()},
        "hw_mem_bandwidth_gbps": bw,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Round-6 optimization harness — separate from the FROZEN bench.py.

Per-query noop-sink timing (guide §1.4) and .explain("formatted") capture
(guide §7.2) for the bench entries, so before/after evidence lands in
plans/r06/ without touching the driver's measurement contract.

Usage:
  python bench_extra.py time q22_ngram_jaccard q33_minhash_pairs [--reps 3]
  python bench_extra.py explain q43_training_selection --tag before
  python bench_extra.py curation_lsh|audio_dedup|snippet|pq|features|flac \
      [--reps 2] [--explain-tag before]
  python bench_extra.py clips [--reps 2]

Timing methodology matches bench.py: same session settings, same sf dir,
noop sink, best-of-reps reported (plus every sample).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _spark():
    from semantic_log_detector_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _time(label, build, reps):
    """best-of-reps noop timing for a plan builder."""
    samples = []
    for _ in range(reps):
        t0 = time.time()
        _noop(build())
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"query": label, "best": min(samples), "samples": samples}))
    return min(samples)


def _explain_str(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _dump_explain(label, df, tag):
    path = Path(__file__).resolve().parent / "plans" / "r06" / f"{label}_{tag}.txt"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(_explain_str(df))
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode")
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tag", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    if args.mode == "time":
        # warm the JVM once, like bench.py
        _noop(qs["q01_pricing_summary"](spark, sf_dir))
        for name in args.names:
            spark.sparkContext.setJobDescription(name)
            _time(name, lambda n=name: qs[n](spark, sf_dir), args.reps)
        return

    if args.mode == "explain":
        for name in args.names:
            _dump_explain(name, qs[name](spark, sf_dir), args.tag or "before")
        return

    if args.mode == "curation_lsh":
        from semantic_log_detector_spark.operators.curate import (
            curate_documents, curation_summary,
        )

        def build():
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            kept = curate_documents(
                docs, langs=("en",), min_quality=0.5, jaccard_threshold=0.5,
                exact_pairs=False,
            )
            return curation_summary(kept)

        _noop(qs["q01_pricing_summary"](spark, sf_dir))
        spark.sparkContext.setJobDescription("curation_lsh")
        if args.tag:
            _dump_explain("curation_lsh", build(), args.tag)
        _time("curation_lsh", build, args.reps)
        return

    if args.mode == "audio_dedup":
        from semantic_log_detector_spark.operators.audio_dedup import audio_dup_pairs

        ddir = "/tmp/sld_bench_cache/dupaudio_v2_20000_7"

        def build():
            return audio_dup_pairs(spark.read.parquet(ddir))

        spark.sparkContext.setJobDescription("audio_dedup_20k")
        if args.tag:
            _dump_explain("audio_dedup_20k", build(), args.tag)
        _time("audio_dedup_20k", build, args.reps)
        return

    if args.mode == "features":
        from pyspark.sql import functions as F

        from semantic_log_detector_spark.operators.features import (
            cmvn_stats, extract_features,
        )

        cdir = "/tmp/sld_bench_cache/clips_60000_42"

        def build():
            sl = spark.read.parquet(cdir).filter(
                F.pmod(F.xxhash64("clip_id"), F.lit(6)) == 0)
            return cmvn_stats(extract_features(sl))

        spark.sparkContext.setJobDescription("features_cmvn_10k")
        if args.tag:
            _dump_explain("features_cmvn_10k", build(), args.tag)
        _time("features_cmvn_10k", build, args.reps)
        return

    if args.mode == "flac":
        from semantic_log_detector_spark.operators.features import (
            cmvn_stats, extract_features,
        )

        pdir = "/tmp/sld_bench_cache/packedflac_v1_2000_7"

        def build():
            return cmvn_stats(extract_features(spark.read.parquet(pdir)))

        spark.sparkContext.setJobDescription("flac_packed_decode_2k")
        if args.tag:
            _dump_explain("flac_packed_decode_2k", build(), args.tag)
        _time("flac_packed_decode_2k", build, args.reps)
        return

    if args.mode == "clips":
        from bench import materialize_clips, run_clips_suite

        n_clips = int(os.environ.get("SPARK_GRAFT_BENCH_CLIPS", 60_000))
        wcdir, wtdir = materialize_clips(spark, 2000)
        wout = tempfile.mkdtemp(prefix="sld_extra_warm_")
        try:
            run_clips_suite(spark, wcdir, wtdir, wout)
        finally:
            shutil.rmtree(wout, ignore_errors=True)
        cdir, tdir = materialize_clips(spark, n_clips)
        samples = []
        for _ in range(args.reps):
            out_dir = tempfile.mkdtemp(prefix="sld_extra_out_")
            try:
                samples.append(round(run_clips_suite(spark, cdir, tdir, out_dir), 3))
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
        print(json.dumps({"query": "clips_suite", "best": min(samples),
                          "samples": samples,
                          "clips_per_sec": round(n_clips / min(samples), 1)}))
        return

    raise SystemExit(f"unknown mode {args.mode!r}")


if __name__ == "__main__":
    main()

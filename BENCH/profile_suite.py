"""Profile the full check suite per-check at one parallelism level.

Usage: python BENCH/profile_suite.py [cores] [n_clips]
Prints per-check duration_ms from the ledger plus total wall, so the
non-scaling constant can be located (BENCH/BASELINE.md efficiency work).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000

    from bench import materialize_clips
    from semantic_log_detector_spark.plans.runner import SuiteConfig, run_suite
    from semantic_log_detector_spark.session import get_spark

    spark = get_spark(app_name=f"profile{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")

    t_setup = time.time()
    cdir, tdir = materialize_clips(spark, n_clips)
    clips = spark.read.parquet(cdir)
    transcripts = spark.read.parquet(tdir)
    clips.count(), transcripts.count()  # warm page cache / reader
    setup_s = time.time() - t_setup

    out_dir = tempfile.mkdtemp(prefix="sld_profile_")
    try:
        t0 = time.time()
        res = run_suite(spark, clips, transcripts, out_dir, SuiteConfig(),
                        input_fingerprint=cdir, clips_path=cdir)
        wall = time.time() - t0
        ledger = spark.read.parquet(f"{out_dir}/ledger")
        rows = (ledger.groupBy("check_id")
                .agg({"wall_ms": "max"}).collect())
        per_check = {r["check_id"]: round(r["max(wall_ms)"] / 1000, 2) for r in rows}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps({
        "cores": cores, "n_clips": n_clips,
        "setup_s": round(setup_s, 2),
        "suite_wall_s": round(wall, 2),
        "sum_checks_s": round(sum(per_check.values()), 2),
        "per_check_s": dict(sorted(per_check.items(), key=lambda kv: -kv[1])),
        "runner_timings_s": {k: round(v, 2) for k, v in
                             sorted(res.timings.items(), key=lambda kv: -kv[1])},
        "clips_per_sec": round(n_clips / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

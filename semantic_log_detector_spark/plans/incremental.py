"""Incremental (delta) validation: validate only files added since the
last run.

At 10^12 clips the corpus is append-only (immutable data files, the lake
contract) and re-validating 100 TB because 1 TB arrived is the difference
between a nightly job and an impossible one. This module keeps a FILES
ledger next to the run outputs: each call lists the table's data files,
anti-joins against the ledger, and runs the standard check suite over the
NEW files only — same verdict/violation/ledger outputs, same wave resume
within an increment (the run ledger's input_fingerprint is the hash of
the increment's file list, so a killed increment resumes where it died).

Drift across increments is scored against a STORED baseline histogram
(written from the first increment, or supplied): the suite's default
self-baseline compares each partition to the same run's global
distribution, which is blind to an increment that drifted uniformly —
exactly the failure mode a daily feed develops. The baseline table is
(feature, bin, cnt) — fixed bins merge exactly across runs (drift.py's
design), kilobytes at any corpus size.

Immutability contract: a ledger file whose SIZE changed is treated as new
(re-validated, recorded again) — mutation of validated files is itself a
pipeline defect, surfaced via `increment_history`, never silently
ignored.

Reference parity: extends the reference's cache short-circuit (stage 1
loads pre-processed splits instead of recomputing when they exist,
`src/ids/data_loader.py:355-362`) from per-run memoization to an
append-only corpus contract, and its stored-drift-baseline advice
(`outputs/reports/final_report.md:144-148`) to a persisted cross-run
histogram.
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .runner import RunResult, SuiteConfig, run_suite

_FILES_LEDGER = "files_ledger"
_BASELINE = "drift_baseline"


def list_data_files(table_dir: str) -> list[tuple[str, int]]:
    """(path, size) for every data file under ``table_dir``, sorted.

    Local/NFS paths only — the same constraint (and reason) as
    sources/payload_scan.py: the Python-side listing short-circuits the
    JVM for the incremental bookkeeping; an object-store deployment lists
    via its manifest/catalog instead."""
    if "://" in table_dir:
        raise ValueError(f"incremental needs a local/NFS path, got {table_dir!r}")
    out = []
    for root, _, names in os.walk(table_dir):
        for n in names:
            if n.endswith(".parquet") and not n.startswith(("_", ".")):
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
    return sorted(out)


def _new_files(
    spark: SparkSession, files: list[tuple[str, int]], ledger_path: str
) -> list[tuple[str, int]]:
    """Files not yet ledgered at their current size, via a Spark left-anti
    join — the driver never holds the ledger (corpus-sized after years of
    increments); it holds only the listing and the increment, which is
    small by definition on every call after the first. At real scale the
    os.walk listing itself is replaced by the table catalog's snapshot
    diff (Iceberg manifests); the ledger/baseline contract is unchanged."""
    try:
        led = spark.read.parquet(ledger_path).select("file", "size")
    except Exception:
        return files
    listing = spark.createDataFrame(files, "file string, size long")
    return [
        (r["file"], r["size"])
        for r in listing.join(led, ["file", "size"], "left_anti").collect()
    ]


def validate_increment(
    spark: SparkSession,
    table_dir: str,
    out_dir: str,
    cfg: SuiteConfig = SuiteConfig(),
    transcripts: DataFrame | None = None,
    write_baseline: bool = True,
    sketches: bool = True,
) -> tuple[int, RunResult | None]:
    """Validate the files of ``table_dir`` not yet in the files ledger.

    Returns (n_new_files, RunResult | None). Verdicts / violations /
    run-ledger land under ``out_dir`` exactly as run_suite writes them
    (append-mode; run_ids distinguish increments — plans/compare.py diffs
    them). On the FIRST increment (no stored baseline) the global feature
    histogram is persisted to ``{out_dir}/drift_baseline`` (one extra
    decode pass over that increment only, once per corpus lifetime) so
    every later increment drift-scores against the corpus' accepted
    distribution rather than its own. ``transcripts`` should cover at
    least the new clips' ids; extra rows cost one filtered join."""
    files = list_data_files(table_dir)
    new = sorted(_new_files(spark, files, f"{out_dir}/{_FILES_LEDGER}"))
    if not new:
        return 0, None

    fingerprint = hashlib.md5(
        "\n".join(f"{p}:{s}" for p, s in new).encode()).hexdigest()
    clips = spark.read.parquet(*[p for p, _ in new])

    baseline_path = f"{out_dir}/{_BASELINE}"
    baseline = None
    have_baseline = False
    try:
        baseline = spark.read.parquet(baseline_path)
        have_baseline = True
    except Exception:
        pass

    res = run_suite(
        spark, clips, transcripts, out_dir, cfg,
        input_fingerprint=f"incr:{fingerprint}",
        drift_baseline=baseline if have_baseline else None,
    )

    if write_baseline and not have_baseline and "drift" in cfg.checks:
        # one-time: persist the first increment's global histogram as the
        # corpus baseline (fixed bins — mergeable/comparable forever after)
        from ..checks.base import RunContext
        from ..checks.drift import decode_stats

        ctx = RunContext(run_id="baseline", num_parts=cfg.num_parts)
        (
            decode_stats(clips, ctx, strict_codecs=cfg.strict_codecs)
            .filter(F.col("kind") == "h")
            .groupBy("feature", "bin")
            .agg(F.sum("cnt").alias("cnt"))
            .coalesce(1)
            .write.mode("overwrite").parquet(baseline_path)
        )

    if sketches:
        # one payload-free agg over the increment: mergeable HLL/KLL
        # sketches so corpus-lifetime distincts/quantiles and the R090
        # duplicate-feed overlap check never rescan old increments
        # (plans/sketch_state.py)
        from .sketch_state import write_increment_sketches

        write_increment_sketches(spark, clips, out_dir, res.run_id)

    # record the increment's files LAST: a crash before this line leaves
    # the files unrecorded and the next call revalidates them — the run
    # ledger's (fingerprint, check, part) resume makes that cheap, and
    # never the reverse (files marked done that were never validated)
    spark.createDataFrame(
        [(p, s, res.run_id, float(time.time())) for p, s in new],
        "file string, size long, run_id string, recorded_at double",
    ).coalesce(1).write.mode("append").parquet(f"{out_dir}/{_FILES_LEDGER}")
    return len(new), res


def increment_history(spark: SparkSession, out_dir: str) -> DataFrame:
    """The files ledger: (file, size, run_id, recorded_at), one row per
    (file, validation). A file appearing twice with different sizes is a
    broken-immutability finding."""
    return spark.read.parquet(f"{out_dir}/{_FILES_LEDGER}")

"""Run lifecycle: plan → execute check waves → verdicts/violations/ledger → report.

Spark-first restatement of the reference's 9-stage hand-sequenced DAG
(`src/ids/pipeline.py:76-231`): config → checks over pending partitions →
persisted outputs per stage. Instead of one monolithic pass, partitions are
processed in deterministic *waves* (part_id % waves) — each wave is one set
of Spark jobs followed by a ledger append, giving kill-anywhere resume at
wave granularity (micro-batch over a partition work-queue; the Structured-
Streaming-shaped replacement for the reference's asyncio queue,
`src/api/main.py:64-75`).

At cluster scale the input is an Iceberg/parquet table partitioned by
part_id, so each wave's `filter(part_id % waves = w)` is partition-pruned —
no full scans per wave. Checks within a wave reuse one cached projection.
"""

from __future__ import annotations

import hashlib
import json
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checks.base import CheckResult, RunContext, ensure_part_id
from ..checks.column_stats import DEFAULT_EXPECTATIONS, stats_check
from ..checks.drift import drift_check
from ..checks.frequency import frequency_check
from ..checks.referential import referential_check
from ..checks.row_rules import default_clip_rules, run_row_rules
from ..checks.schema_check import schema_check
from ..checks.transcript_quality import transcript_quality_check
from ..checks.uniqueness import uniqueness_check
from ..schema import CLIPS_SCHEMA
from . import ledger as ledger_mod

ALL_CHECKS = ("schema", "row_rules", "stats", "uniqueness", "referential",
              "frequency", "transcript_quality", "drift")


@dataclass(frozen=True)
class SuiteConfig:
    num_parts: int = 64
    checks: tuple[str, ...] = ALL_CHECKS
    allowed_codecs: tuple[str, ...] = ("pcm_s16le", "flac", "mulaw", "alaw", "adpcm_ima", "opus", "mp3")
    sr_range: tuple[int, int] = (4000, 96000)
    dur_range: tuple[int, int] = (1, 12 * 3600 * 1000)
    rate_range: tuple[float, float] = (6.5, 26.5)  # R018 chars/sec band
    psi_threshold: float = 0.2
    ks_threshold: float = 0.2
    # R067 speech rate: transcript words vs VAD-measured speech seconds,
    # computed inside the drift check's decode pass (needs transcripts).
    # The decoded twin of the R018 metadata chars/sec rule — catches
    # transcripts paired with silence or the wrong clip. Bounds are
    # generous (natural speech ~2-3 wps); widen/disable for music corpora.
    speech_rate: bool = True
    wps_range: tuple[float, float] = (0.4, 8.0)
    # strict: clips whose declared codec has no REGISTERED real decoder are
    # violations; lenient (default): fake decodes pass but are counted and
    # reported per partition in the R062 verdict (never silent)
    strict_codecs: bool = False
    waves: int = 1
    # AQE during the batched wave actions. The suite's verdict/violation
    # plans have fixed shapes (per-part aggregates over a cached slice, one
    # equi-join) that the static planner already gets right; AQE's
    # stage-by-stage re-planning serializes the N independent check
    # subtrees inside the one batched action (measured 3.4× on the
    # collect: 7.7 s → 2.3 s at 60k clips / 32 cores). part_id is
    # pmod(xxhash64) — uniform by construction — so skew splitting buys
    # nothing here. Set True if the transcript join key is pathologically
    # skewed. Session AQE settings are untouched outside the action window.
    adaptive_wave_exec: bool = False
    # shuffle-partition count for the batched wave action. The frames
    # shuffled here are tiny by construction — verdicts are at most
    # parts×rules rows and violations are example-capped — so the session
    # default (sized for the big dedup/join queries) buys nothing and costs
    # ~0.25 s of task-launch latency per exchange × ~10 exchanges.
    # Measured at 60k clips / 32 cores: 8 partitions takes the combined
    # collect from 6.8 s to ~3.7 s. None = leave the session value.
    wave_shuffle_partitions: int | None = 8
    stats_expectations: tuple = tuple(
        (c, tuple(exps)) for c, exps in DEFAULT_EXPECTATIONS.items()
    )

    def config_hash(self) -> str:
        return hashlib.md5(
            json.dumps(asdict(self), sort_keys=True, default=str).encode()
        ).hexdigest()[:16]


@dataclass
class RunResult:
    run_id: str
    out_dir: str
    waves_run: int
    checks_run: list[str] = field(default_factory=list)
    wall_s: float = 0.0
    n_rows: int = 0
    # per-phase wall seconds (accumulated over waves): plan build per check,
    # the batched collect, the two writes — the observability needed to keep
    # fixed (non-scaling) cost honest. Populated by run_suite.
    timings: dict = field(default_factory=dict)
    # populated by validate_increment(dup_check=True): counts + sink path of
    # the increment's cross-corpus content-duplicate pairs (ann_index)
    dup_check: dict | None = None


def _wave_parts(cfg: SuiteConfig, wave: int) -> list[int]:
    return [p for p in range(cfg.num_parts) if p % cfg.waves == wave]


def run_suite(
    spark: SparkSession,
    clips: DataFrame,
    transcripts: DataFrame | None,
    out_dir: str,
    cfg: SuiteConfig = SuiteConfig(),
    run_id: str | None = None,
    input_fingerprint: str = "",
    max_waves: int | None = None,
    clips_path: str | None = None,
    drift_baseline: DataFrame | None = None,
) -> RunResult:
    """Execute the configured check suite; everything lands under out_dir:
    verdicts/ violations/ ledger/ report.json. Re-running with the same
    (input_fingerprint, config) resumes: completed (check, part) pairs are
    skipped via the ledger anti-join.

    ``clips_path``: when ``clips`` is a pure parquet scan of that path,
    the drift check's payload pass runs as the Python-native row-group
    reader (bytes never cross the JVM→worker socket). Only pass it for an
    untransformed scan — filters applied to ``clips`` do NOT reach the
    raw-file reader.

    ``drift_baseline``: a stored (feature, bin, cnt) histogram table for
    CROSS-RUN drift — each partition is scored against it instead of the
    run's own global histogram (the self-baseline misses an increment
    that drifted uniformly; see plans/incremental.py)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    ctx = RunContext(run_id=run_id, num_parts=cfg.num_parts,
                     config_hash=cfg.config_hash())
    if clips_path is not None:
        from ..sources.payload_scan import validate_payload_path

        reason = validate_payload_path(clips_path, cfg.num_parts)
        if reason is not None:
            import logging

            logging.getLogger(__name__).warning(
                "payload scan path %r rejected (%s); drift falls back to the "
                "JVM-fed decode pass", clips_path, reason)
            clips_path = None
    ledger_path = f"{out_dir}/ledger"
    t_start = time.time()

    clips = ensure_part_id(clips, ctx)
    result = RunResult(run_id=run_id, out_dir=out_dir, waves_run=0)

    # one ledger scan for the whole run; our own appends tracked in-memory
    done_map = ledger_mod.completed_map(
        spark, ledger_path, input_fingerprint, ctx.config_hash)

    # schema check is plan-time + global — run once, outside the wave loop
    if "schema" in cfg.checks:
        if -1 not in done_map.get("schema", set()):
            t0 = time.time()
            res = schema_check(clips, CLIPS_SCHEMA, ctx)
            # plan-time check → driver-local rows, sunk without Spark jobs
            ledger_mod.write_local_rows(
                f"{out_dir}/verdicts", res.metrics["local_verdicts"], "verdicts")
            ledger_mod.write_local_rows(
                f"{out_dir}/violations", res.metrics["local_violations"], "violations")
            ledger_mod.append(
                spark, ledger_path, run_id, "schema",
                [(-1, 0, len(res.metrics["local_violations"]))],
                (time.time() - t0) * 1000, input_fingerprint, ctx.config_hash)
            done_map.setdefault("schema", set()).add(-1)
            result.checks_run.append("schema")

    wave_checks = [c for c in cfg.checks if c != "schema"]
    n_waves = cfg.waves if max_waves is None else min(cfg.waves, max_waves)

    for wave in range(n_waves):
        parts = _wave_parts(cfg, wave)
        pending_by_check = {
            c: sorted(set(parts) - done_map.get(c, set())) for c in wave_checks
        }
        if not any(pending_by_check.values()):
            result.waves_run += 1
            continue

        union_parts = sorted({p for ps in pending_by_check.values() for p in ps})
        # partition-pruned slice of the input; cached once per wave so the
        # metadata-only checks share a single scan. NB: bytes intentionally
        # excluded from the cache — only drift reads them, streamed not cached.
        meta_cols = [c for c in clips.columns if c != "bytes"]
        # cache the metadata slice at a REDUCED partition count: every
        # metadata check fans ~2 map stages out of this cache, so 32 scan
        # splits × ~16 subtrees ≈ 1000 tiny tasks in the batched action;
        # coalescing bounds that at about a quarter with unchanged bytes
        # (round 6; measured collect 6.8 → 4.3 s at 60k clips). The
        # target is SCALE-ADAPTIVE, not a constant: an 8:1 merge floor —
        # scan splits are sized by TOTAL file bytes, and the cached
        # metadata columns are a small fraction of that, so 8 merged
        # splits of metadata stay far under one payload split's size —
        # never below the wave shuffle-partition count. A corpus-sized
        # table keeps thousands of cache partitions; only the
        # tiny-partition regime is compacted.
        meta_slice = clips.select(*meta_cols).filter(
            F.col(ctx.part_col).isin(union_parts))
        try:
            n_scan = meta_slice.rdd.getNumPartitions()
        except Exception:
            n_scan = 0
        n_cache_parts = max(cfg.wave_shuffle_partitions or 8, n_scan // 8)
        wave_meta = meta_slice.coalesce(n_cache_parts).cache()

        tr_part = F.pmod(F.xxhash64("clip_id"), F.lit(cfg.num_parts)).cast("int")

        built: list[tuple[str, list[int], CheckResult, float]] = []
        try:
            # Build every pending check's (lazy) plan first, tagged with its
            # check_id, then execute the whole wave with THREE actions: one
            # stats collect over the persisted verdict union, one verdicts
            # write, one violations write. Per-check actions (2 writes + 1
            # collect each) are pure fixed scheduling cost that does not
            # shrink with cores — batching them is what keeps the N→4N
            # scaling efficiency honest at sandbox input sizes.
            #
            # The drift build is EAGER (its decode pass materializes at
            # build time for the tiny-histogram collect), so it runs in a
            # driver thread while the main thread builds the other checks'
            # plans (guide §2.6: overlap independent work — the cluster is
            # busy decoding while the driver does ~2 s of pure py4j plan
            # construction; measured back-to-back at 60k clips / 32 cores).
            # InheritableThread carries the Spark thread-locals; results
            # are re-inserted at drift's original position so ledger/union
            # order — and therefore every output — is unchanged.
            def build_check(check: str, pend: list[int]) -> CheckResult | None:
                sub_meta = wave_meta.filter(F.col(ctx.part_col).isin(pend))
                if check == "row_rules":
                    return run_row_rules(
                        sub_meta,
                        default_clip_rules(cfg.allowed_codecs, cfg.sr_range,
                                           cfg.dur_range, cfg.rate_range),
                        ctx)
                if check == "stats":
                    return stats_check(sub_meta, ctx,
                                       {c: list(e) for c, e in cfg.stats_expectations})
                if check == "uniqueness":
                    return uniqueness_check(sub_meta, ctx)
                if check == "referential":
                    if transcripts is None:
                        return None
                    # transcripts filtered to THIS check's pending parts
                    # (not the wave union) so resumed runs never emit
                    # verdicts for partitions outside their pending set
                    return referential_check(
                        sub_meta, transcripts.filter(tr_part.isin(pend)), ctx)
                if check == "frequency":
                    return frequency_check(sub_meta, ctx, allowed=cfg.allowed_codecs)
                if check == "transcript_quality":
                    return transcript_quality_check(sub_meta, ctx)
                if check == "drift":
                    sub_full = clips.filter(F.col(ctx.part_col).isin(pend))
                    return drift_check(sub_full, ctx,
                                       psi_threshold=cfg.psi_threshold,
                                       ks_threshold=cfg.ks_threshold,
                                       strict_codecs=cfg.strict_codecs,
                                       baseline=drift_baseline,
                                       payload_path=clips_path,
                                       pending_parts=(
                                           pend if len(pend) < cfg.num_parts else None),
                                       transcripts=(
                                           transcripts.filter(tr_part.isin(pend))
                                           if cfg.speech_rate and transcripts is not None
                                           else None),
                                       wps_range=cfg.wps_range)
                raise ValueError(f"unknown check {check!r}")

            drift_future = None
            drift_pend: list[int] = []
            t_drift = 0.0
            if "drift" in wave_checks and pending_by_check.get("drift"):
                from concurrent.futures import ThreadPoolExecutor

                from pyspark import inheritable_thread_target

                drift_pend = pending_by_check["drift"]
                t_drift = time.time()
                _pool = ThreadPoolExecutor(max_workers=1)
                drift_future = _pool.submit(
                    inheritable_thread_target(spark)(
                        lambda: build_check("drift", drift_pend)))
                _pool.shutdown(wait=False)
            for check in wave_checks:
                pend = pending_by_check[check]
                if not pend:
                    continue
                if check == "drift" and drift_future is not None:
                    res = drift_future.result()
                    built.append((check, pend, res, time.time() - t_drift))
                    continue
                t0 = time.time()
                res = build_check(check, pend)
                if res is None:
                    continue
                built.append((check, pend, res, time.time() - t0))

            if built:
                # Pad verdicts and violations to one superset schema and
                # union EVERYTHING into a single persisted frame: every
                # check's verdict AND violation subtree executes exactly
                # once, inside one parallel job (independent map stages
                # overlap). The previous 3-action shape (collect over a
                # persisted verdict union, then a violations write) executed
                # the violation subtrees — including the referential
                # full_outer join — a second time in a second job.
                VKIND, LKIND = "r", "v"
                combined = None
                for check, _, res, _ in built:
                    v = res.verdicts.select(
                        "run_id", "part_id", "rule_id", "passed", "n_rows",
                        "n_violations", "observed", "expected",
                        F.lit(None).cast("string").alias("clip_id"),
                        F.lit(None).cast("string").alias("column"),
                        F.lit(None).cast("string").alias("severity"),
                        F.lit(None).cast("string").alias("explanation"),
                        F.lit(VKIND).alias("__kind"),
                        F.lit(check).alias("__check"),
                    )
                    l = res.violations.select(
                        "run_id", "part_id", "rule_id",
                        F.lit(None).cast("boolean").alias("passed"),
                        F.lit(None).cast("long").alias("n_rows"),
                        F.lit(None).cast("long").alias("n_violations"),
                        "observed", "expected", "clip_id", "column",
                        "severity", "explanation",
                        F.lit(LKIND).alias("__kind"),
                        F.lit(check).alias("__check"),
                    )
                    both = v.unionByName(l)
                    combined = both if combined is None else combined.unionByName(both)
                aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
                sp_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
                try:
                    if not cfg.adaptive_wave_exec:
                        spark.conf.set("spark.sql.adaptive.enabled", "false")
                    if cfg.wave_shuffle_partitions is not None:
                        spark.conf.set("spark.sql.shuffle.partitions",
                                       str(cfg.wave_shuffle_partitions))
                    t0 = time.time()
                    combined.persist()
                    stats = (
                        combined.filter(F.col("__kind") == VKIND)
                        .groupBy("__check", "part_id")
                        .agg(F.max("n_rows").alias("nr"), F.sum("n_violations").alias("nv"))
                        .collect()
                    )
                    t1 = time.time()
                    # both writes read the persisted frame — no recompute.
                    # verdicts are ≤ parts×rules rows → one file; violations
                    # are sparse → a few files (not 100s of near-empty ones)
                    combined.filter(F.col("__kind") == VKIND).select(
                        "run_id", "part_id", "rule_id", "passed", "n_rows",
                        "n_violations", "observed", "expected",
                    ).coalesce(1).write.mode("append").parquet(f"{out_dir}/verdicts")
                    t2 = time.time()
                    combined.filter(F.col("__kind") == LKIND).select(
                        "run_id", "part_id", "rule_id", "clip_id", "column",
                        "observed", "expected", "severity", "explanation",
                    ).coalesce(8).write.mode("append").parquet(f"{out_dir}/violations")
                    t3 = time.time()
                    combined.unpersist()
                finally:
                    spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
                    spark.conf.set("spark.sql.shuffle.partitions", sp_before)
                tm = result.timings
                tm["exec_collect_s"] = tm.get("exec_collect_s", 0.0) + (t1 - t0)
                tm["write_verdicts_s"] = tm.get("write_verdicts_s", 0.0) + (t2 - t1)
                tm["write_violations_s"] = tm.get("write_violations_s", 0.0) + (t3 - t2)

                by_check: dict[str, dict[int, tuple[int, int]]] = {}
                for r in stats:
                    by_check.setdefault(r["__check"], {})[r["part_id"]] = (r["nr"], r["nv"])
                for check, pend, _, build_s in built:
                    got = by_check.get(check, {})
                    part_stats = [(p, *(got.get(p, (0, 0)))) for p in pend]
                    ledger_mod.append(
                        spark, ledger_path, run_id, check, part_stats,
                        build_s * 1000, input_fingerprint, ctx.config_hash)
                    done_map.setdefault(check, set()).update(pend)
                    result.timings[f"plan_{check}_s"] = (
                        result.timings.get(f"plan_{check}_s", 0.0) + build_s
                    )
                    if check not in result.checks_run:
                        result.checks_run.append(check)
        finally:
            if drift_future is not None and not any(
                c == "drift" for c, *_ in built
            ):
                # a non-drift build raised while drift was still building:
                # await it so its persisted resources don't leak
                try:
                    drift_future.result().release()
                except Exception:
                    pass
            for _, _, res, _ in built:
                res.release()
            wave_meta.unpersist()
        result.waves_run += 1

    result.wall_s = time.time() - t_start
    return result



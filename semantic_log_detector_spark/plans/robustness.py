"""Robustness harness: seeded noise grid × seeds → verdict stability.

Graft of the reference's feature-noise robustness test
(`src/ids/robustness.py:44-158`: noise levels × perturbation runs →
prediction stability, degradation %, overall robustness score, JSON report)
onto the validation engine: the "prediction" is the per-partition drift
verdict, and the perturbation is deterministic Gaussian noise injected into
the decoded PCM at level × clip-RMS inside the single Arrow decode pass
(checks/drift.py::stats_record_batch) — no extra data materialization, the
noisy run costs the same one payload pass as a clean run.

Stability(level, seed) = fraction of (partition, drift-rule) verdicts that
match the clean baseline — the engine analog of the reference's "% of
predictions that stayed the same". Everything collected is verdict-sized
(parts × rules), never per-clip.
"""

from __future__ import annotations

import json
import logging
import os

from pyspark.sql import DataFrame

from ..checks.base import RunContext
from ..checks.drift import R_KS, R_PSI, drift_check

_LOG = logging.getLogger(__name__)

_DRIFT_RULES = (R_PSI, R_KS)


def _verdict_map(ctx: RunContext, clips: DataFrame, noise, **kw) -> dict:
    """(part_id, rule_id) → passed for the drift rules of one run."""
    res = drift_check(clips, ctx, noise=noise, **kw)
    try:
        rows = res.verdicts.filter(
            res.verdicts["rule_id"].isin(list(_DRIFT_RULES))
        ).select("part_id", "rule_id", "passed").collect()
        return {(r["part_id"], r["rule_id"]): r["passed"] for r in rows}
    finally:
        res.release()


def run_robustness(
    clips: DataFrame,
    ctx: RunContext,
    noise_levels: tuple[float, ...] = (0.01, 0.05, 0.1),
    num_perturbations: int = 3,
    base_seed: int = 42,
    out_dir: str | None = None,
    **drift_kw,
) -> dict:
    """Noise grid × seeds over the clips table → stability report dict.

    Mirrors the reference report shape (`robustness.py:104-145`):
    per-level perturbation runs with stability, a per-level summary with
    mean stability and flagged-partition degradation, and an overall
    robustness score (mean stability across levels). Writes
    ``robustness_report.json`` under ``out_dir`` when given.
    """
    clean = _verdict_map(ctx, clips, noise=None, **drift_kw)
    n_cells = len(clean)
    clean_flagged = sorted({p for (p, _r), ok in clean.items() if not ok})
    _LOG.info(
        "robustness: clean baseline has %d flagged partitions (%s)",
        len(clean_flagged), clean_flagged,
    )

    results = {
        "clean_baseline": {
            "n_verdict_cells": n_cells,
            "flagged_partitions": clean_flagged,
        },
        "noise_tests": [],
    }
    for level in noise_levels:
        runs = []
        for run in range(num_perturbations):
            seed = base_seed + run
            noisy = _verdict_map(ctx, clips, noise=(level, seed), **drift_kw)
            same = sum(1 for k, v in clean.items() if noisy.get(k) == v)
            # an empty verdict grid is vacuously stable, not 0% stable
            stability = same / n_cells if n_cells else 1.0
            flagged = sorted({p for (p, _r), ok in noisy.items() if not ok})
            runs.append(
                {
                    "run": run,
                    "seed": seed,
                    "stability": round(stability, 4),
                    "flagged_partitions": flagged,
                    "n_flipped": n_cells - same,
                }
            )
            _LOG.info(
                "robustness: level=%.3f seed=%d stability=%.4f flagged=%s",
                level, seed, stability, flagged,
            )
        mean_stability = sum(r["stability"] for r in runs) / len(runs)
        # fraction of clean-flagged partitions still flagged per run; with
        # no clean detections there is nothing to lose — vacuously 1.0
        # (0.0 would misreport a clean dataset as total detection loss)
        retained = [
            (sum(1 for p in clean_flagged if p in set(r["flagged_partitions"]))
             / len(clean_flagged)) if clean_flagged else 1.0
            for r in runs
        ]
        results["noise_tests"].append(
            {
                "noise_level": level,
                "perturbation_runs": runs,
                "summary": {
                    "mean_stability": round(mean_stability, 4),
                    "detection_retention": round(sum(retained) / len(retained), 4),
                    "stability_degradation_pct": round((1 - mean_stability) * 100, 2),
                },
            }
        )
    results["overall_robustness_score"] = round(
        sum(t["summary"]["mean_stability"] for t in results["noise_tests"])
        / max(len(results["noise_tests"]), 1),
        4,
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "robustness_report.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
        _LOG.info("robustness report saved to %s", path)
    return results

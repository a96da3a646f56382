"""Custom stateful streaming operator: per-key rolling drift.

The reference's drift monitor keeps an in-process deque of recent scores
and compares against a fixed baseline (`src/monitoring/drift.py:18-47`) —
single-process state, lost on restart. The Spark-native recast is
``applyInPandasWithState``: per-partition histogram state lives in the
streaming state store (checkpointed, exactly-once, survives restarts and
rescaling), each micro-batch updates its key's accumulated histogram and
emits the PSI of the batch against the accumulated PRIOR distribution —
"has this partition's data started looking different from everything it
has sent so far".

Same fixed-bin + Laplace-smoothed PSI math as the batch drift check
(checks/drift.py), so thresholds are portable between the modes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..checks.drift import _ALPHA, BinSpec

_OUT_SCHEMA = (
    "part_id int, batch_rows long, total_rows long, psi double, flagged boolean"
)
_STATE_SCHEMA = "counts array<long>, total long"


def _psi(batch: np.ndarray, prior: np.ndarray) -> float:
    nb = len(batch)
    p = (batch + _ALPHA) / (batch.sum() + _ALPHA * nb)
    q = (prior + _ALPHA) / (prior.sum() + _ALPHA * nb)
    return float(((p - q) * np.log(p / q)).sum())


def stream_rolling_drift(
    stream_df: DataFrame,
    value_col: str = "dur_ms",
    key_col: str = "part_id",
    bins: BinSpec = BinSpec(0.0, 12000.0, 24),
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Per-key rolling drift on a stream.

    State per key: (histogram counts, total rows). Each micro-batch bins
    ``value_col``, scores PSI(batch ‖ accumulated-prior), then folds the
    batch into the state. Emits one row per (key, micro-batch):
    (part_id, batch_rows, total_rows, psi, flagged). First batch of a key
    has no prior → psi 0.0, unflagged.
    """
    lo, hi, nb = bins.lo, bins.hi, bins.n

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            counts_list, total = state.get
            counts = np.asarray(counts_list, dtype=np.int64)
        else:
            counts, total = np.zeros(nb, dtype=np.int64), 0
        new = np.zeros(nb, dtype=np.int64)
        n_batch = 0
        for pdf in pdfs:
            v = pd.to_numeric(pdf[value_col], errors="coerce").to_numpy(dtype=float)
            v = v[np.isfinite(v)]
            if len(v):
                idx = np.clip(
                    ((v - lo) / (hi - lo) * nb).astype(int), 0, nb - 1
                )
                new += np.bincount(idx, minlength=nb)
            n_batch += len(v)
        psi = _psi(new, counts) if total > 0 and n_batch > 0 else 0.0
        counts = counts + new
        total = int(total) + n_batch
        state.update((counts.tolist(), total))
        yield pd.DataFrame(
            [
                {
                    "part_id": int(key[0]),
                    "batch_rows": n_batch,
                    "total_rows": total,
                    "psi": round(psi, 6),
                    "flagged": bool(psi > psi_threshold),
                }
            ]
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )

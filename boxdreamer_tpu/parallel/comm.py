"""Cross-process communication for multi-host training/eval.

Replaces the reference's detectron2-style pickle gather over
torch.distributed (src/utils/comm.py: get_world_size/get_rank/synchronize/
gather/all_gather; used for metric aggregation at
BoxDreamer_lightning_model.py:164-289) with jax process APIs and
fixed-shape array collectives: on TPU pods there is no object gather —
metrics travel as padded arrays via multihost_utils.process_allgather.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across processes (reference comm.synchronize)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("boxdreamer_sync")


def all_gather_array(x: np.ndarray) -> np.ndarray:
    """All-gather a fixed-shape array across processes -> stacked on axis 0."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def all_gather_metric_lists(
    values: Dict[str, List[float]], max_len: int = 1 << 16
) -> Dict[str, List[float]]:
    """Gather variable-length per-process metric lists by padding to a fixed
    shape with NaN and dropping the padding after the collective — the
    fixed-shape replacement for the reference's pickle gather."""
    if jax.process_count() == 1:
        return values
    out: Dict[str, List[float]] = {}
    for key in sorted(values):
        v = np.asarray(values[key], dtype=np.float64)
        padded = np.full(max_len, np.nan)
        padded[: len(v)] = v[:max_len]
        gathered = all_gather_array(padded)  # (P, max_len)
        merged = gathered[~np.isnan(gathered)]
        out[key] = merged.tolist()
    return out


def gather_metrics(metrics) -> "object":
    """Merge Metrics accumulators across processes onto every process
    (reference DataProcessor.gather_data + rank-0 aggregate_metrics,
    data_utils.py:87-98)."""
    if jax.process_count() == 1:
        return metrics
    for name, cats in list(metrics._store.items()):
        for cat in list(cats):
            merged = all_gather_metric_lists({f"{name}/{cat}": cats[cat]})
            cats[cat] = merged[f"{name}/{cat}"]
    return metrics

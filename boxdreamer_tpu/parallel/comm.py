"""Cross-process communication for multi-host training/eval.

Replaces the reference's detectron2-style pickle gather over
torch.distributed (src/utils/comm.py: get_world_size/get_rank/synchronize/
gather/all_gather; used for metric aggregation at
BoxDreamer_lightning_model.py:164-289) with jax process APIs and
fixed-shape array collectives: on TPU pods there is no object gather —
metrics travel as padded arrays via multihost_utils.process_allgather.
"""

from __future__ import annotations

from typing import Dict, List

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
    """All-gather a fixed-shape array across processes -> stacked on axis 0.

    64-bit dtypes travel as raw bytes: with jax_enable_x64 off (the
    default), process_allgather silently downcasts float64->float32 /
    int64->int32, which flips threshold-boundary metrics (caught by
    tests/parallel/test_multihost.py)."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x[None]
    from jax.experimental import multihost_utils

    if x.dtype.itemsize == 8:
        flat = np.ascontiguousarray(x).reshape(-1).view(np.uint8)
        gathered = np.asarray(multihost_utils.process_allgather(flat))
        return gathered.view(x.dtype).reshape((gathered.shape[0],) + x.shape)
    return np.asarray(multihost_utils.process_allgather(x))


def all_gather_bytes(blob: bytes) -> List[bytes]:
    """All-gather an arbitrary byte blob from every process (two fixed-shape
    collectives: a size gather, then a max-size-padded payload gather)."""
    if jax.process_count() == 1:
        return [blob]
    sizes = all_gather_array(np.array([len(blob)], dtype=np.int64))[:, 0]
    max_size = int(sizes.max())
    buf = np.zeros(max(max_size, 1), dtype=np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = all_gather_array(buf)
    return [bytes(gathered[p, : int(sizes[p])].tobytes())
            for p in range(gathered.shape[0])]


_MANIFEST_BYTES = 1 << 16


def _all_gather_manifests(local: Dict[str, int]) -> List[Dict[str, int]]:
    """All-gather each process's {key: list_length} manifest as a fixed-size
    utf-8 buffer. This makes the subsequent value gather safe when processes
    hold DIFFERENT key sets (e.g. eval categories sharded by process) — a
    per-key collective would deadlock on key-set mismatch."""
    import json

    blob = json.dumps(local, sort_keys=True).encode()
    if len(blob) > _MANIFEST_BYTES:
        raise ValueError(
            f"metric manifest {len(blob)}B exceeds {_MANIFEST_BYTES}B budget"
        )
    buf = np.zeros(_MANIFEST_BYTES, dtype=np.uint8)
    buf[: len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = all_gather_array(buf)  # (P, _MANIFEST_BYTES)
    out = []
    for row in gathered:
        raw = bytes(row.tobytes()).rstrip(b"\x00")
        out.append(json.loads(raw.decode()) if raw else {})
    return out


def all_gather_metric_lists(
    values: Dict[str, List[float]],
) -> Dict[str, List[float]]:
    """Gather variable-length per-process metric lists: the fixed-shape
    replacement for the reference's pickle gather (src/utils/comm.py gather +
    BoxDreamer_lightning_model.py:164-217). Key sets may differ between
    processes; the result on every process holds the union of keys with
    values concatenated in process order. Exactly two collectives
    regardless of key count: one manifest gather, one value gather."""
    if jax.process_count() == 1:
        return {k: list(v) for k, v in values.items()}
    manifests = _all_gather_manifests({k: len(v) for k, v in values.items()})
    all_keys = sorted(set().union(*[m.keys() for m in manifests]))
    if not all_keys:
        # Every process was empty — the manifest collective already kept
        # the processes aligned, so just return (a zero-size value gather
        # is not portable across backends).
        return {}
    max_len = max(
        [length for m in manifests for length in m.values()], default=0
    )
    block = np.zeros((len(all_keys), max(max_len, 1)), dtype=np.float64)
    for i, key in enumerate(all_keys):
        v = np.asarray(values.get(key, []), dtype=np.float64)
        block[i, : len(v)] = v
    gathered = all_gather_array(block)  # (P, n_keys, max_len)
    out: Dict[str, List[float]] = {}
    for i, key in enumerate(all_keys):
        merged: List[float] = []
        for p, manifest in enumerate(manifests):
            merged.extend(gathered[p, i, : manifest.get(key, 0)].tolist())
        out[key] = merged
    return out


def gather_metrics(metrics) -> "object":
    """Merge Metrics accumulators across processes onto every process
    (reference DataProcessor.gather_data + rank-0 aggregate_metrics,
    data_utils.py:87-98). Handles differing category sets per process and
    also merges the per-image pose/error record dicts used by the
    path_pose_dict/path_error_dict npy dumps (metric_utils.py:668-678)."""
    if jax.process_count() == 1:
        return metrics
    flat = {
        f"{name}\x00{cat}": vals
        for name, cats in metrics._store.items()
        for cat, vals in cats.items()
    }
    merged = all_gather_metric_lists(flat)
    metrics._store.clear()
    for key, vals in merged.items():
        name, cat = key.split("\x00", 1)
        metrics._store[name][cat] = vals

    import pickle

    records = pickle.dumps(
        (dict(metrics._pose_records), dict(metrics._error_records))
    )
    for p, blob in enumerate(all_gather_bytes(records)):
        if p == jax.process_index():
            continue
        pose_rec, err_rec = pickle.loads(blob)
        for cat, d in pose_rec.items():
            metrics._pose_records[cat].update(d)
        for cat, d in err_rec.items():
            metrics._error_records[cat].update(d)
    return metrics

"""Device-memory introspection and cleanup.

Equivalent of the reference MemoryManager
(src/lightning/utils/memory_utils/memory_utils.py:13-45 — recursive del +
torch.cuda.empty_cache). JAX owns allocation; the useful TPU-side
operations are live-buffer statistics, explicit deletion of pytrees, and a
cleanup context manager with the same call surface.
"""

from __future__ import annotations

import contextlib
import gc
from typing import Any, Dict

import jax


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend reports them."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:  # noqa: BLE001 — backend may not support stats
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
                "bytes_limit": stats.get("bytes_limit", -1),
            }
    return out


def live_buffer_bytes() -> int:
    """Total bytes of live arrays on all local devices."""
    total = 0
    for d in jax.local_devices():
        try:
            for buf in d.live_buffers():
                total += buf.nbytes
        except Exception:  # noqa: BLE001
            pass
    return total


def to_host(tree: Any, dtype=None) -> Any:
    """Copy a pytree of device arrays to host numpy (reference
    DataProcessor.back_to_cpu, data_utils.py:18-39 — the CPU offload +
    optional upcast used before metric computation)."""
    import numpy as np

    def convert(x):
        if isinstance(x, jax.Array):
            arr = np.asarray(x)
            return arr.astype(dtype) if dtype is not None else arr
        return x

    return jax.tree_util.tree_map(convert, tree)


def free_pytree(tree: Any) -> None:
    """Explicitly delete all device arrays in a pytree (reference
    MemoryManager.release equivalent)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                leaf.delete()
            except Exception:  # noqa: BLE001 — already deleted/donated
                pass


@contextlib.contextmanager
def auto_cleanup(*trees: Any):
    """Free the given pytrees on exit (reference auto_cleanup ctx manager)."""
    try:
        yield
    finally:
        for t in trees:
            free_pytree(t)
        gc.collect()

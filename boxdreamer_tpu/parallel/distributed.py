"""Multi-host initialization.

The reference relies on Lightning to spawn torch.distributed process groups
(strategy 'ddp', NCCL). The TPU-pod equivalent: one process per host, each
calling :func:`initialize` before any jax device use; the ('data','model')
mesh then spans all hosts' devices and GSPMD handles cross-host collectives
over ICI/DCN automatically.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from boxdreamer_tpu.utils.log import INFO


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host.

    On TPU pods the arguments auto-populate from the environment; on
    CPU/GPU clusters pass them explicitly (or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). Safe no-op for single-process runs
    without coordinator configuration.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") and not os.environ.get(
        "PALLAS_AXON_POOL_IPS"
    )
    if coordinator_address is None and not tpu_pod:
        INFO("single-process run (no coordinator configured)")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    INFO(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )


def per_host_batch_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this host should load (data loaders are
    per-host; arrays are assembled into the global batch via device_put with
    the mesh sharding)."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)

"""Device mesh and sharding-rule construction.

The canonical layout is a 2-axis ('data', 'model') mesh over ICI
(SURVEY.md §2.5 mapping). Batch tensors shard on 'data'; transformer
weights shard on 'model' (qkv/fc1 on the output feature dim, proj/fc2 on
the input feature dim) so that GSPMD inserts exactly the two classic
tensor-parallel all-reduces per block. Everything else is replicated.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Args:
        data: data-parallel size; -1 = all remaining devices.
        model: tensor-parallel size.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter-path regexes -> PartitionSpec for 2D kernels (in_dim, out_dim).
# Megatron-style column/row parallelism on every transformer block.
_COL_PARALLEL = re.compile(r"(attn/qkv|mlp/fc1|input_transform/fc1)")
_ROW_PARALLEL = re.compile(r"(attn/proj|mlp/fc2|input_transform/fc2)")


def _spec_for(path_str: str, shape: tuple) -> P:
    if len(shape) == 2:
        if _COL_PARALLEL.search(path_str):
            return P(None, "model")
        if _ROW_PARALLEL.search(path_str):
            return P("model", None)
    if len(shape) == 1 and _COL_PARALLEL.search(path_str):
        # Bias of a column-parallel layer shards with the output dim.
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a model param pytree (tensor parallelism)."""

    def assign(path, leaf):
        path_str = "/".join(getattr(k, "key", str(k)) for k in path)
        return NamedSharding(mesh, _spec_for(path_str, np.shape(leaf)))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree onto the mesh according to the TP rules."""
    shardings = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

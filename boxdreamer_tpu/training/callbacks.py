"""Training callbacks: feature-map monitoring and artifact upload.

Equivalents of the reference callback layer
(src/lightning/utils/callbacks/custom_callbacks.py:38-142 NetworkMonitor —
a forward-hook feature-map visualizer, off by default — and
wandb_callbacks.py code/checkpoint artifact upload). Torch forward hooks
become flax ``capture_intermediates``: a pure re-run of the model with
intermediate capture, visualized as per-layer activation grids.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from boxdreamer_tpu.utils.log import INFO


def capture_feature_maps(
    model,
    params: Any,
    inputs: Sequence[Any],
    filter_names: Sequence[str] = ("attn", "mlp"),
) -> Dict[str, np.ndarray]:
    """Run the model with intermediate capture and return named activations
    (the flax equivalent of torch forward hooks)."""

    def keep(mdl, method_name):
        return method_name == "__call__"

    _, state = model.apply(
        params, *inputs, capture_intermediates=keep, mutable=["intermediates"]
    )

    out: Dict[str, np.ndarray] = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, tuple):
            for i, v in enumerate(tree):
                walk(v, prefix)
        else:
            if any(f in prefix for f in filter_names):
                out[prefix] = np.asarray(tree)

    walk(state["intermediates"])
    return out


def feature_map_grid(activation: np.ndarray, max_channels: int = 16) -> np.ndarray:
    """Token activations (B, N, C) or maps (B, C, H, W) -> a uint8 grid image
    (reference NetworkMonitor's matplotlib grids)."""
    a = np.asarray(activation, dtype=np.float32)
    if a.ndim == 3:  # tokens: (B, N, C) -> square grid per channel
        B, N, C = a.shape
        side = int(round(N**0.5))
        if side * side != N:
            a = a[:, : side * side]
        a = a[0].T.reshape(C, side, side)
    elif a.ndim == 4:
        a = a[0]
    else:
        return np.zeros((8, 8), np.uint8)
    a = a[:max_channels]
    a = (a - a.min(axis=(1, 2), keepdims=True)) / np.maximum(
        np.ptp(a, axis=(1, 2)).reshape(-1, 1, 1), 1e-6
    )
    n = len(a)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    H, W = a.shape[1:]
    grid = np.zeros((rows * H, cols * W), np.float32)
    for i, fm in enumerate(a):
        r, c = divmod(i, cols)
        grid[r * H : (r + 1) * H, c * W : (c + 1) * W] = fm
    return (grid * 255).astype(np.uint8)


class NetworkMonitor:
    """Periodic feature-map dumping (reference NetworkMonitor; off by
    default like the reference's callback config)."""

    def __init__(self, model, out_dir: str, every_n_steps: int = 1000,
                 enabled: bool = False):
        self.model = model
        self.out_dir = out_dir
        self.every_n_steps = every_n_steps
        self.enabled = enabled
        os.makedirs(out_dir, exist_ok=True)

    def maybe_dump(self, params: Any, inputs: Sequence[Any], step: int):
        if not self.enabled or step % self.every_n_steps != 0:
            return
        from PIL import Image

        feats = capture_feature_maps(self.model, params, inputs)
        for name, act in list(feats.items())[:8]:
            grid = feature_map_grid(act)
            fname = name.replace("/", "_") + f"_{step}.png"
            Image.fromarray(grid).save(os.path.join(self.out_dir, fname))
        INFO(f"NetworkMonitor dumped {min(len(feats), 8)} feature maps @ {step}")


def upload_artifacts(
    run, checkpoint_dir: Optional[str] = None, code_dir: Optional[str] = None
):
    """wandb code/checkpoint artifact upload (reference wandb_callbacks.py);
    no-op when wandb run is None."""
    if run is None:
        return
    import wandb

    if code_dir:
        art = wandb.Artifact("code", type="code")
        art.add_dir(code_dir)
        run.log_artifact(art)
    if checkpoint_dir and os.path.isdir(checkpoint_dir):
        art = wandb.Artifact("checkpoints", type="model")
        art.add_dir(checkpoint_dir)
        run.log_artifact(art)

"""Checkpointing: orbax save/restore with the reference's resume semantics.

Equivalent of the reference's checkpoint handling: Lightning ModelCheckpoint
(save every 200 steps + last, configs/callbacks/default.yaml:1-13),
resume-vs-pretrain precedence (run.py:109-152: resume_ckpt wins if it
exists, else pretrained_ckpt), and the shape-mismatch-tolerant pretrained
load (BoxDreamer_lightning_model.py:54-86 — mismatched keys are dropped
with a warning instead of failing).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from boxdreamer_tpu.utils.log import INFO, WARNING


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a TrainState (or any pytree) to `path` (a directory)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint, using `target` as the
    structure/sharding template."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def load_pretrained_params(path: str, params: Any) -> Any:
    """Merge pretrained params into `params`, skipping missing keys and any
    leaf whose shape mismatches (reference load_pretrained_params,
    BoxDreamer_lightning_model.py:54-86)."""
    restored = restore_checkpoint(path, jax.eval_shape(lambda: params))
    flat_cur = dict(
        jax.tree_util.tree_flatten_with_path(params)[0]
    )
    flat_new = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    merged = {}
    skipped = []
    for key, cur in flat_cur.items():
        new = flat_new.get(key)
        if new is not None and np.shape(new) == np.shape(cur):
            merged[key] = new
        else:
            skipped.append(jax.tree_util.keystr(key))
            merged[key] = cur
    if skipped:
        WARNING(f"pretrained load skipped {len(skipped)} params: {skipped[:8]}...")
    treedef = jax.tree_util.tree_structure(params)
    leaves = [merged[k] for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def resolve_resume(
    resume_ckpt: Optional[str],
    pretrained_ckpt: Optional[str],
    resume: bool,
    use_pretrained: bool,
) -> Tuple[Optional[str], str]:
    """Resume-vs-pretrain precedence (reference run.py:109-152).

    Returns (path, mode) with mode in {'resume', 'pretrained', 'fresh'}.
    """
    if resume and resume_ckpt and os.path.exists(resume_ckpt):
        INFO(f"resuming from {resume_ckpt}")
        return resume_ckpt, "resume"
    if use_pretrained and pretrained_ckpt and os.path.exists(pretrained_ckpt):
        INFO(f"loading pretrained weights from {pretrained_ckpt}")
        return pretrained_ckpt, "pretrained"
    return None, "fresh"


class CheckpointManager:
    """Step-interval + last checkpoint management (reference ModelCheckpoint:
    every 200 steps, save_last, keep best by monitor)."""

    def __init__(
        self,
        directory: str,
        every_n_steps: int = 200,
        monitor: str = "val_loss",
        keep: int = 3,
    ):
        self.directory = os.path.abspath(directory)
        self.every_n_steps = every_n_steps
        self.monitor = monitor
        self.best: Optional[float] = None
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    @property
    def last_path(self) -> str:
        return os.path.join(self.directory, "last")

    def maybe_save_step(self, state: Any) -> bool:
        step = int(state.step)
        if step % self.every_n_steps != 0:
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        return True

    def save_last(self, state: Any) -> None:
        save_checkpoint(self.last_path, state, force=True)

    def maybe_save_best(self, state: Any, value: float, mode: str = "min") -> bool:
        """Keep the best checkpoint by the monitored value. mode='min' for
        losses/errors, 'max' for accuracy metrics (e.g. val ADD-0.1d)."""
        better = (
            self.best is None
            or (mode == "min" and value < self.best)
            or (mode == "max" and value > self.best)
        )
        if better:
            self.best = value
            save_checkpoint(os.path.join(self.directory, "best"), state, force=True)
            return True
        return False

    def wait(self):
        self._mgr.wait_until_finished()

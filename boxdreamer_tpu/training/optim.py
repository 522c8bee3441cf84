"""Optimizer and LR-schedule factories (optax).

Equivalent of the reference's optimizer layer
(src/lightning/utils/optimizers/optimizers.py:13-182): Adam/AdamW with
MultiStep / CosineAnnealing / Exponential schedules, each optionally wrapped
in a linear/exp/cos warmup. Defaults mirror configs/model/opt/default.yaml
(AdamW, lr 4e-4, wd 0.1, cosine annealing to 1e-6, 10k-step linear warmup).

Frozen submodules (the DINOv2 encoder by default) are excluded from the
optimizer entirely via optax.multi_transform — stop_gradient alone would
still weight-decay them under AdamW.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Mirrors configs/model/opt/default.yaml of the reference."""

    optimizer: str = "adamw"  # 'adam' | 'adamw'
    lr: float = 4e-4
    adam_decay: float = 0.0
    adamw_decay: float = 0.1
    scheduler: str = "CosineAnnealing"  # 'MultiStepLR' | 'CosineAnnealing' | 'ExponentialLR' | 'constant'
    mslr_milestones: Sequence[int] = (30, 50, 100, 200, 300, 400)
    mslr_gamma: float = 0.5
    cosa_tmax: int = 500
    cosa_eta_min: float = 1e-6
    elr_gamma: float = 0.999992
    use_warmup: bool = True
    warmup_steps: int = 10000
    warmup_type: str = "linear"  # 'linear' | 'exponential' | 'cosine'
    grad_clip_norm: Optional[float] = None
    frozen_prefixes: Sequence[str] = ("encoder",)


def build_schedule(cfg: OptimConfig) -> optax.Schedule:
    """LR schedule: warmup ramp into the main decay schedule."""
    if cfg.scheduler == "CosineAnnealing":
        main = optax.cosine_decay_schedule(
            init_value=cfg.lr,
            decay_steps=max(cfg.cosa_tmax, 1),
            alpha=cfg.cosa_eta_min / cfg.lr,
        )
    elif cfg.scheduler == "MultiStepLR":
        boundaries = {int(m): cfg.mslr_gamma for m in cfg.mslr_milestones}
        main = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    elif cfg.scheduler == "ExponentialLR":
        main = lambda step: cfg.lr * cfg.elr_gamma**step  # noqa: E731
    elif cfg.scheduler == "constant":
        main = optax.constant_schedule(cfg.lr)
    else:
        raise ValueError(f"Unknown scheduler {cfg.scheduler}")

    if not cfg.use_warmup or cfg.warmup_steps <= 0:
        return main

    w = cfg.warmup_steps

    def schedule(step):
        # Ramp shapes match the reference WarmupScheduler.get_lr exactly
        # (optimizers.py:46-64): linear = alpha, exponential = alpha^3
        # (cubic, NOT an exp curve despite the name), cosine =
        # 1 - cos(alpha * pi/2) (quarter-wave, 0 -> 1).
        frac = jnp.clip(step / w, 0.0, 1.0)
        if cfg.warmup_type == "linear":
            ramp = frac
        elif cfg.warmup_type == "exponential":
            ramp = frac**3
        elif cfg.warmup_type == "cosine":
            ramp = 1.0 - jnp.cos(frac * jnp.pi / 2.0)
        else:
            raise ValueError(f"Unknown warmup {cfg.warmup_type}")
        return jnp.where(step < w, ramp * main(0), main(step - w))

    return schedule


def _is_frozen(path: tuple, prefixes: Sequence[str]) -> bool:
    keys = {getattr(k, "key", str(k)) for k in path}
    return any(p in keys for p in prefixes)


def build_optimizer(cfg: OptimConfig, params: Any) -> optax.GradientTransformation:
    """AdamW/Adam with schedule; frozen subtrees get zero updates."""
    schedule = build_schedule(cfg)
    if cfg.optimizer == "adamw":
        base = optax.adamw(schedule, weight_decay=cfg.adamw_decay)
    elif cfg.optimizer == "adam":
        base = optax.adam(schedule)
        if cfg.adam_decay:
            base = optax.chain(optax.add_decayed_weights(cfg.adam_decay), base)
    else:
        raise ValueError(f"Invalid optimizer {cfg.optimizer}")

    if cfg.grad_clip_norm:
        base = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), base)

    if not cfg.frozen_prefixes:
        return base

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen" if _is_frozen(path, cfg.frozen_prefixes) else "train",
        params,
    )
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, labels
    )

"""DUSt3R-style 3D regression losses (pure JAX).

Equivalent of the reference's vendored reconstruction-finetuning losses
(src/loss/lossesV3.py:13-399: Regr3D, ConfLoss, scale-shift-invariant
variants; not in the default config — used for reconstruction-supervision
experiments). Pointmaps are (B, H, W, 3) with (B, H, W) validity masks and
optional per-pixel confidences.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def normalize_pointcloud(
    pts: jax.Array, valid: jax.Array, mode: str = "avg_dis"
) -> jax.Array:
    """Scale-normalize a pointmap by the average distance of valid points to
    the origin (DUSt3R 'avg_dis' norm_mode)."""
    dis = jnp.linalg.norm(pts, axis=-1)
    if mode == "avg_dis":
        scale = _masked_mean(dis, valid)
    elif mode == "median_dis":
        # Masked median via sorting with invalid entries pushed to +inf.
        flat = jnp.where(valid.reshape(valid.shape[0], -1) > 0,
                         dis.reshape(dis.shape[0], -1), jnp.inf)
        n_valid = (valid.reshape(valid.shape[0], -1) > 0).sum(-1)
        sorted_ = jnp.sort(flat, axis=-1)
        idx = jnp.maximum(n_valid // 2, 0)
        scale = jnp.take_along_axis(sorted_, idx[:, None], axis=-1).mean()
    else:
        raise ValueError(f"unknown norm mode {mode}")
    return pts / jnp.maximum(scale, 1e-8)


def regr3d(
    pred_pts: jax.Array,
    gt_pts: jax.Array,
    valid: jax.Array,
    norm_mode: Optional[str] = "avg_dis",
    dist: str = "l2",
) -> jax.Array:
    """Per-pixel 3D regression distances (reference Regr3D,
    lossesV3.py:13-…): both clouds normalized independently, then L2/L1.

    Args:
        pred_pts, gt_pts: (B, H, W, 3); valid: (B, H, W) bool.

    Returns:
        (B, H, W) per-pixel distances (zeros at invalid pixels).
    """
    if norm_mode:
        pred_pts = normalize_pointcloud(pred_pts, valid, norm_mode)
        gt_pts = normalize_pointcloud(gt_pts, valid, norm_mode)
    diff = pred_pts.astype(jnp.float32) - gt_pts.astype(jnp.float32)
    if dist == "l2":
        d = jnp.linalg.norm(diff, axis=-1)
    elif dist == "l1":
        d = jnp.abs(diff).sum(-1)
    else:
        raise ValueError(f"unknown dist {dist}")
    return jnp.where(valid, d, 0.0)


def conf_loss(
    per_pixel_loss: jax.Array,
    conf: jax.Array,
    valid: jax.Array,
    alpha: float = 0.2,
) -> jax.Array:
    """Confidence-weighted aggregation (reference ConfLoss,
    lossesV3.py:234-…): ``mean(conf * loss - alpha * log(conf))`` over valid
    pixels, with conf = 1 + exp(raw) ensuring conf >= 1."""
    conf = 1.0 + jnp.exp(conf.astype(jnp.float32))
    weighted = conf * per_pixel_loss - alpha * jnp.log(conf)
    return _masked_mean(weighted, valid)


def regr3d_scale_shift_inv(
    pred_pts: jax.Array,
    gt_pts: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Scale&shift-invariant variant: solve per-batch optimal scale/shift of
    the prediction onto GT on valid pixels before the distance (reference
    scale-shift-invariant Regr3D variants)."""
    B = pred_pts.shape[0]
    p = pred_pts.reshape(B, -1, 3).astype(jnp.float32)
    g = gt_pts.reshape(B, -1, 3).astype(jnp.float32)
    m = valid.reshape(B, -1, 1).astype(jnp.float32)
    n = jnp.maximum(m.sum(axis=1), 1.0)
    mu_p = (p * m).sum(axis=1) / n
    mu_g = (g * m).sum(axis=1) / n
    pc = (p - mu_p[:, None]) * m
    gc = (g - mu_g[:, None]) * m
    s = (pc * gc).sum(axis=(1, 2)) / jnp.maximum((pc * pc).sum(axis=(1, 2)), 1e-8)
    aligned = s[:, None, None] * (p - mu_p[:, None]) + mu_g[:, None]
    d = jnp.linalg.norm(aligned - g, axis=-1)
    return jnp.where(valid.reshape(B, -1), d, 0.0).reshape(valid.shape)

"""Bounding-box feature-map generation — vectorized XLA version.

Replaces the reference's per-corner Python loops in ``make_bbox_features``
(src/datasets/utils/base/bbox_utils.py:215-313) and the numpy CornerNet
machinery (src/datasets/utils/preprocess.py:303-442) with fully batched,
jittable ops. These run either on-device (fused into the inference program)
or as part of the host preprocessing pipeline under ``jax.jit`` on CPU.

Feature types (matching reference semantics bit-for-bit where data-independent):
  * ``heatmap``:     (..., 8, H, W) distance-gaussian per corner, normalized to
                     max 1 and then mapped to [-1, 1].
  * ``voting``:      (..., 16, H, W) per-pixel (dx, dy) offsets to each corner,
                     normalized by W/H.
  * ``conf_voting``: (..., 24, H, W) offsets + confidence.
  * ``cornernet``:   (..., 8, H, W) CornerNet gaussian peaks in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pixel_grid(H: int, W: int, dtype=jnp.float32):
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    return xs, ys


def make_heatmap_features(
    bbox_2d: jax.Array, H: int, W: int, joint_frames: bool = True
) -> jax.Array:
    """Distance-gaussian corner heatmaps (reference 'heatmap' type,
    src/datasets/utils/base/bbox_utils.py:263-303).

    For corner ``i`` at pixel ``c_i``: ``h_i(p) = exp(-|p - c_i| / s_i)`` with
    ``s_i = (|c_i - center| / 10)^2``, max-normalized, then mapped to [-1, 1].

    The reference normalizes ``bbox_map[..., i].max()`` over the WHOLE
    leading (frame) axis of one sample jointly — per corner, across all T
    frames — not per frame (bbox_utils.py:303 is a global ``.max()`` over a
    (T, H, W) slice). ``joint_frames=True`` reproduces that: for inputs with
    a frame axis ((T, 8, 2) or (B, T, 8, 2)) the max is shared across T.

    Args:
        bbox_2d: (8, 2), (T, 8, 2) or (B, T, 8, 2) corner pixels (x, y).
        H, W: output map size.

    Returns:
        (..., 8, H, W) heatmaps in [-1, 1].
    """
    dtype = jnp.promote_types(bbox_2d.dtype, jnp.float32)
    bbox_2d = bbox_2d.astype(dtype)
    xs, ys = _pixel_grid(H, W, dtype)
    # (..., 8, H, W) distances from every pixel to each corner.
    dx = bbox_2d[..., :, 0, None, None] - xs[None, None, :]
    dy = bbox_2d[..., :, 1, None, None] - ys[None, :, None]
    dist = jnp.sqrt(dx * dx + dy * dy)

    center = jnp.mean(bbox_2d, axis=-2)  # (..., 2)
    corner_to_center = jnp.linalg.norm(
        bbox_2d - center[..., None, :], axis=-1
    )  # (..., 8)
    scale = (corner_to_center / 10.0) ** 2
    scale = jnp.maximum(scale, 1e-12)

    hm = jnp.exp(-dist / scale[..., None, None])
    if joint_frames and bbox_2d.ndim >= 3:
        # hm is (..., T, 8, H, W): share the max across the frame axis.
        peak = jnp.max(hm, axis=(-4, -2, -1), keepdims=True)
    else:
        peak = jnp.max(hm, axis=(-2, -1), keepdims=True)
    hm = hm / jnp.maximum(peak, 1e-12)
    return hm * 2.0 - 1.0


def make_voting_features(bbox_2d: jax.Array, H: int, W: int) -> jax.Array:
    """Per-pixel corner-offset voting maps (reference 'voting' type,
    src/datasets/utils/base/bbox_utils.py:235-261).

    Args:
        bbox_2d: (..., 8, 2) corner pixel coordinates.

    Returns:
        (..., 16, H, W): channels ordered [c0x, c0y, c1x, c1y, ...] with x
        offsets normalized by W and y offsets by H.
    """
    dtype = jnp.promote_types(bbox_2d.dtype, jnp.float32)
    bbox_2d = bbox_2d.astype(dtype)
    xs, ys = _pixel_grid(H, W, dtype)
    full = bbox_2d.shape[:-2] + (8, H, W)
    dx = jnp.broadcast_to(
        (bbox_2d[..., :, 0, None, None] - xs[None, None, :]) / W, full
    )
    dy = jnp.broadcast_to(
        (bbox_2d[..., :, 1, None, None] - ys[None, :, None]) / H, full
    )
    # Interleave to [c0x, c0y, c1x, c1y, ...].
    stacked = jnp.stack([dx, dy], axis=-3)  # (..., 8, 2, H, W)
    return stacked.reshape(bbox_2d.shape[:-2] + (16, H, W))


def make_conf_voting_features(bbox_2d: jax.Array, H: int, W: int) -> jax.Array:
    """Offsets + distance-based confidence, (..., 24, H, W).

    Confidence for corner ``i`` is the normalized heatmap value in [0, 1]
    (the reference trains conf_voting with the same gaussian prior).
    """
    voting = make_voting_features(bbox_2d, H, W)  # (..., 16, H, W)
    conf = (make_heatmap_features(bbox_2d, H, W) + 1.0) / 2.0  # (..., 8, H, W)
    vot = voting.reshape(bbox_2d.shape[:-2] + (8, 2, H, W))
    both = jnp.concatenate([vot, conf[..., :, None, :, :]], axis=-3)  # (..., 8, 3, H, W)
    return both.reshape(bbox_2d.shape[:-2] + (24, H, W))


def _gaussian_radius(height: jax.Array, width: jax.Array, min_overlap: float = 0.3):
    """CornerNet gaussian radius (reference ``gaussian_radius``,
    src/datasets/utils/preprocess.py:350-380); branch-free."""

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - safe_sqrt(b1 * b1 - 4 * a1 * c1)) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 - safe_sqrt(b2 * b2 - 4 * a2 * c2)) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + safe_sqrt(b3 * b3 - 4 * a3 * c3)) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def make_cornernet_features(
    bbox_2d: jax.Array, H: int, W: int, min_overlap: float = 0.3
) -> jax.Array:
    """CornerNet-style gaussian peak heatmaps in [-1, 1]
    (reference ``generate_cornernet_heatmap``,
    src/datasets/utils/preprocess.py:383-442), vectorized.

    Corners outside the map produce a zero heatmap, matching the reference's
    skip behavior.
    """
    dtype = jnp.promote_types(bbox_2d.dtype, jnp.float32)
    bbox_2d = bbox_2d.astype(dtype)
    mins = jnp.min(bbox_2d, axis=-2)
    maxs = jnp.max(bbox_2d, axis=-2)
    width = maxs[..., 0] - mins[..., 0]
    height = maxs[..., 1] - mins[..., 1]
    radius = jnp.maximum(
        jnp.floor(_gaussian_radius(height, width, min_overlap)), 1.0
    )  # (...,)
    diameter = 2.0 * radius + 1.0
    sigma = diameter / 6.0

    centers = jnp.floor(bbox_2d)  # integer centers as in the reference
    xs, ys = _pixel_grid(H, W, dtype)
    dx = xs[None, None, :] - centers[..., :, 0, None, None]  # (..., 8, H, W)
    dy = ys[None, :, None] - centers[..., :, 1, None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma)[..., None, None, None])
    # Only draw inside the radius window (chebyshev), as draw_gaussian does.
    window = (jnp.abs(dx) <= radius[..., None, None, None]) & (
        jnp.abs(dy) <= radius[..., None, None, None]
    )
    inside = (
        (centers[..., :, 0] >= 0)
        & (centers[..., :, 1] >= 0)
        & (centers[..., :, 0] < W)
        & (centers[..., :, 1] < H)
    )
    hm = jnp.where(window & inside[..., None, None], g, 0.0)
    hm = jnp.clip(hm, 0.0, 1.0)
    return hm * 2.0 - 1.0


_FEATURE_CHANNELS = {"heatmap": 8, "voting": 16, "conf_voting": 24, "cornernet": 8}


def feature_channels(bbox_representation: str) -> int:
    """Channel count of a bbox feature representation."""
    return _FEATURE_CHANNELS[bbox_representation]


def make_bbox_features(
    bbox_2d: jax.Array, bbox_representation: str, H: int, W: int
) -> jax.Array:
    """Dispatch on representation type (reference ``make_bbox_features``)."""
    if bbox_representation == "heatmap":
        return make_heatmap_features(bbox_2d, H, W)
    if bbox_representation == "voting":
        return make_voting_features(bbox_2d, H, W)
    if bbox_representation == "conf_voting":
        return make_conf_voting_features(bbox_2d, H, W)
    if bbox_representation == "cornernet":
        return make_cornernet_features(bbox_2d, H, W)
    raise NotImplementedError(f"Invalid bbox representation {bbox_representation}")

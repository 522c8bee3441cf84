"""Keypoint decoding from predicted bbox feature maps — on-device, batched.

Replaces the reference's ``recover_bb8_corners``
(src/models/utils/box_utils.py:7-110). The reference runs this in torch and
then leaves the device for OpenCV PnP; here decode stays on TPU and feeds the
batched PnP solve (ops/pnp.py) inside the same XLA program.

Layout note: this module takes channels-first maps (..., C, H, W), matching
the network output; the reference permutes between (B, T, H, W, C) and
channels-first internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TOPK_DEFAULT = 20  # reference k=20 (box_utils.py:86)


def decode_heatmap_topk(
    heatmaps: jax.Array, k: int = TOPK_DEFAULT
) -> tuple[jax.Array, jax.Array]:
    """Decode corner locations as the mean of the top-k heatmap positions
    (reference box_utils.py:75-99).

    Args:
        heatmaps: (..., 8, H, W) predictions in [-1, 1].

    Returns:
        (normalized_kpts, kpts): (..., 8, 2) each; ``kpts`` in pixels (x, y),
        ``normalized_kpts`` in [-1, 1] via (k / [W, H]) * 2 - 1.
    """
    *lead, C, H, W = heatmaps.shape
    flat = heatmaps.astype(jnp.float32).reshape(*lead, C, H * W)
    # Reference converts from [-1,1] to [0,1] before top-k; monotonic, so the
    # selected indices are identical — skip the rescale.
    #
    # Since only the MEAN of the top-k positions is needed, extract maxima
    # iteratively (k sequential max+argmax+mask passes — pure VPU
    # reductions) instead of jax.lax.top_k's sort machinery: 3.3x faster on
    # TPU at 224x224 maps (1.17 vs 3.91 ms/batch8 on v5e) and bit-identical
    # (argmax and top_k share first-occurrence tie order).
    pos = jnp.arange(H * W, dtype=jnp.int32)
    zeros = jnp.zeros(flat.shape[:-1], jnp.float32)

    def step(carry, _):
        f, acc_x, acc_y = carry
        idx = jnp.argmax(f, axis=-1)
        xs = (idx % W).astype(jnp.float32)
        ys = (idx // W).astype(jnp.float32)
        f = jnp.where(pos == idx[..., None], -jnp.inf, f)
        return (f, acc_x + xs, acc_y + ys), None

    (_, acc_x, acc_y), _ = jax.lax.scan(
        step, (flat, zeros, zeros), None, length=k
    )
    kpts = jnp.stack([acc_x / k, acc_y / k], axis=-1)  # (..., 8, 2)
    return _normalize_kpts(kpts, H, W), kpts


def decode_heatmap_soft_argmax(
    heatmaps: jax.Array, temperature: float = 0.05
) -> tuple[jax.Array, jax.Array]:
    """Differentiable alternative: softmax-weighted expectation of positions.

    Not in the reference; provided for end-to-end-differentiable training of
    the pose head. Temperature ~0.05 approaches the hard top-k decode.
    """
    *lead, C, H, W = heatmaps.shape
    flat = heatmaps.astype(jnp.float32).reshape(*lead, C, H * W)
    weights = jax.nn.softmax(flat / temperature, axis=-1)
    pos = jnp.arange(H * W)
    xs = (pos % W).astype(jnp.float32)
    ys = (pos // W).astype(jnp.float32)
    kx = jnp.einsum("...k,k->...", weights, xs)
    ky = jnp.einsum("...k,k->...", weights, ys)
    kpts = jnp.stack([kx, ky], axis=-1)
    return _normalize_kpts(kpts, H, W), kpts


def decode_voting(voting: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Decode corners as the mean of per-pixel votes (reference
    box_utils.py:35-50).

    Args:
        voting: (..., 16, H, W) normalized offsets [c0x, c0y, c1x, c1y, ...].

    Returns:
        (normalized_kpts, kpts) as in :func:`decode_heatmap_topk`.
    """
    *lead, C, H, W = voting.shape
    v = voting.astype(jnp.float32).reshape(*lead, 8, 2, H, W)
    dx = v[..., 0, :, :] * W  # (..., 8, H, W)
    dy = v[..., 1, :, :] * H
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    votes_x = xs[None, None, :] + dx
    votes_y = ys[None, :, None] + dy
    kpts = jnp.stack(
        [votes_x.mean(axis=(-2, -1)), votes_y.mean(axis=(-2, -1))], axis=-1
    )
    return _normalize_kpts(kpts, H, W), kpts


def decode_conf_voting(feat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Confidence-weighted vote decode (reference box_utils.py:52-73).

    Args:
        feat: (..., 24, H, W) as [c0x, c0y, c0conf, c1x, ...].
    """
    *lead, C, H, W = feat.shape
    v = feat.astype(jnp.float32).reshape(*lead, 8, 3, H, W)
    dx = v[..., 0, :, :] * W
    dy = v[..., 1, :, :] * H
    conf = v[..., 2, :, :]
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    votes_x = xs[None, None, :] + dx
    votes_y = ys[None, :, None] + dy
    conf_sum = conf.sum(axis=(-2, -1)) + 1e-7
    kx = (votes_x * conf).sum(axis=(-2, -1)) / conf_sum
    ky = (votes_y * conf).sum(axis=(-2, -1)) / conf_sum
    kpts = jnp.stack([kx, ky], axis=-1)
    return _normalize_kpts(kpts, H, W), kpts


def decode_bbox_features(
    feat: jax.Array, bbox_representation: str, k: int = TOPK_DEFAULT
) -> tuple[jax.Array, jax.Array]:
    """Dispatch on representation (reference ``recover_bb8_corners``)."""
    if bbox_representation in ("heatmap", "cornernet"):
        return decode_heatmap_topk(feat, k=k)
    if bbox_representation == "voting":
        return decode_voting(feat)
    if bbox_representation == "conf_voting":
        return decode_conf_voting(feat)
    raise NotImplementedError(f"Invalid bbox representation {bbox_representation}")


def _normalize_kpts(kpts: jax.Array, H: int, W: int) -> jax.Array:
    wh = jnp.array([W, H], dtype=kpts.dtype)
    return (kpts / wh) * 2.0 - 1.0

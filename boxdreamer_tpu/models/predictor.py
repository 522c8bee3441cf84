"""Serving-oriented predictor with reference-token caching.

The reference demo re-encodes all N reference frames with DINOv2 on every
query frame (src/demo/demo.py:1499-1612 -> BoxDreamerModel._process_rgb_
features runs the encoder over the full (B, T, ...) stack each call). But
reference tokens and their bbox embeddings are constant per object — so this
predictor encodes them once, keeps them on device, and the per-frame program
is only:

    DINOv2(query crop) -> BETR over [cached ref tokens; query tokens]
    -> top-k decode -> batched PnP

This is the biggest single throughput win over the reference (SURVEY.md §7).
All stages are jitted; nothing leaves the device until the pose comes back.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from boxdreamer_tpu.models.betr import BETR
from boxdreamer_tpu.models.boxdreamer import BoxDreamer, BoxDreamerConfig
from boxdreamer_tpu.models.dinov2 import DinoViT
from boxdreamer_tpu.ops import decode as decode_ops
from boxdreamer_tpu.ops import pnp as pnp_ops


def encoder_apply(model: BoxDreamer, params: Any, images: jax.Array) -> jax.Array:
    """Run the encoder submodule alone: (B, 3, H, W) -> (B, P, C)."""
    enc = DinoViT(model.config.dino)
    return enc.apply({"params": params["params"]["encoder"]}, images)


def decoder_apply(
    model: BoxDreamer,
    params: Any,
    bbox_feat: jax.Array,
    camera_mask: jax.Array,
    rgb_tokens: jax.Array,
) -> jax.Array:
    """Run the BETR submodule alone on precomputed tokens. The serving
    contract puts the query frame LAST (camera_mask[:, -1]), so the final
    attention block computes only the query frame's token outputs
    (query_last fast path — exact)."""
    dec = BETR(model.config.betr)
    return dec.apply(
        {"params": params["params"]["decoder"]},
        bbox_feat,
        None,
        camera_mask,
        pretrain_rgb_feat=rgb_tokens,
        query_last=True,
    )


def decoder_embed(
    model: BoxDreamer,
    params: Any,
    bbox_feat: jax.Array,
    camera_mask: jax.Array,
    rgb_tokens: jax.Array,
) -> jax.Array:
    """Fused per-frame BETR tokens only (B, T, P, d) — the cacheable part of
    the decoder input (bbox patchify+embed, adapter MLP+LN, learnable query,
    positional embedding)."""
    dec = BETR(model.config.betr)
    return dec.apply(
        {"params": params["params"]["decoder"]},
        bbox_feat,
        None,
        camera_mask,
        pretrain_rgb_feat=rgb_tokens,
        embed_only=True,
    )


def decoder_attend(
    model: BoxDreamer,
    params: Any,
    fuse: jax.Array,
    camera_mask: jax.Array,
) -> jax.Array:
    """Attention stack + head over precomputed fused tokens (query frame
    last — the final block runs in query_last fast-path mode)."""
    dec = BETR(model.config.betr)
    return dec.apply(
        {"params": params["params"]["decoder"]},
        None,
        None,
        camera_mask,
        precomputed_fuse=fuse,
        query_last=True,
    )


def predict_query(
    model: BoxDreamer,
    params: Any,
    query_image: jax.Array,
    ref_tokens: jax.Array,
    ref_bbox_feat: jax.Array,
    bbox_3d: jax.Array,
    K: jax.Array,
    ref_fuse: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Single-query inference against cached references. Jittable.

    Args:
        query_image: (B, 3, H, W) query crop in [0, 1].
        ref_tokens: (B, N_ref, P, C) cached encoder tokens.
        ref_bbox_feat: (B, N_ref, c, H, W) reference bbox features.
        bbox_3d: (B, 8, 3) object box corners.
        K: (B, 3, 3) query crop intrinsics (non-NDC).
        ref_fuse: (B, N_ref, P, d) cached FUSED decoder tokens for the
            references (from decoder_embed). When given, the per-query
            program skips all reference-side embedding (~37 GF/frame at
            flagship shapes) and only embeds the query frame.

    Returns:
        dict with pred_bbox, pred_kpts_2d, pred_poses for the query.
    """
    cfg = model.config
    B, n_ref = ref_tokens.shape[:2]
    T = n_ref + 1

    q_tokens = encoder_apply(model, params, query_image)  # (B, P, C)
    q_tokens = jax.lax.stop_gradient(q_tokens)
    camera_mask = jnp.zeros((B, T), dtype=bool).at[:, -1].set(True)
    c = ref_bbox_feat.shape[2]

    if ref_fuse is not None:
        # Embed ONLY the query frame (its bbox features are replaced by the
        # learnable query anyway), then splice into the cached ref tokens.
        S = ref_bbox_feat.shape[-1]
        q_mask = jnp.ones((B, 1), dtype=bool)
        q_fuse = decoder_embed(
            model,
            params,
            jnp.zeros((B, 1, c, S, S), ref_bbox_feat.dtype),
            q_mask,
            q_tokens[:, None],
        )
        fuse = jnp.concatenate([ref_fuse.astype(q_fuse.dtype), q_fuse], axis=1)
        heatmaps = decoder_attend(model, params, fuse, camera_mask)
    else:
        tokens = jnp.concatenate([ref_tokens, q_tokens[:, None]], axis=1)
        # Query bbox features are ignored (replaced by the learnable query).
        bbox_feat = jnp.concatenate(
            [ref_bbox_feat, jnp.zeros_like(ref_bbox_feat[:, :1])], axis=1
        )
        heatmaps = decoder_apply(model, params, bbox_feat, camera_mask, tokens)
    norm_kpts, kpts = decode_ops.decode_bbox_features(
        heatmaps, cfg.bbox_representation, k=cfg.decode_topk
    )
    poses = pnp_ops.solve_pnp(bbox_3d, kpts, K, iters=cfg.pnp_iters)
    return {
        "pred_bbox": heatmaps,
        "pred_kpts_2d": kpts,
        "pred_kpts_2d_normalized": norm_kpts,
        "pred_poses": poses,
    }


class Predictor:
    """Stateful convenience wrapper for per-frame pose tracking (demo-style).

    Usage:
        p = Predictor(model, params)
        p.set_references(ref_images, ref_bbox_feat, bbox_3d)
        pose = p.predict(query_crop, K)["pred_poses"]
    """

    def __init__(self, model: BoxDreamer, params: Any):
        self.model = model
        self.params = params
        self._encode = jax.jit(
            functools.partial(encoder_apply, model)
        )
        self._embed = jax.jit(
            functools.partial(decoder_embed, model)
        )
        self._predict = jax.jit(
            functools.partial(predict_query, model)
        )
        self._refs: Optional[Dict[str, jax.Array]] = None

    def set_references(
        self,
        ref_images: jax.Array,
        ref_bbox_feat: jax.Array,
        bbox_3d: jax.Array,
    ) -> None:
        """Encode and cache reference frames — both the encoder tokens AND
        the fused decoder tokens (constant per object). Shapes:
        (B, N, 3, H, W), (B, N, c, H, W), (B, 8, 3)."""
        B, N = ref_images.shape[:2]
        flat = ref_images.reshape((B * N,) + ref_images.shape[2:])
        tokens = self._encode(self.params, flat)
        tokens = tokens.reshape(B, N, tokens.shape[1], tokens.shape[2])
        ref_mask = jnp.zeros((B, N), dtype=bool)
        ref_fuse = self._embed(
            self.params, jnp.asarray(ref_bbox_feat), ref_mask, tokens
        )
        self._refs = {
            "tokens": jax.block_until_ready(tokens),
            "fuse": jax.block_until_ready(ref_fuse),
            "bbox_feat": jnp.asarray(ref_bbox_feat),
            "bbox_3d": jnp.asarray(bbox_3d),
        }

    def predict(self, query_image: jax.Array, K: jax.Array) -> Dict[str, jax.Array]:
        assert self._refs is not None, "call set_references first"
        return self._predict(
            self.params,
            query_image,
            self._refs["tokens"],
            self._refs["bbox_feat"],
            self._refs["bbox_3d"],
            K,
            self._refs["fuse"],
        )

"""Dense-reference mode: DINO-similarity filtering, multi-round sub-batch
decoding, and pooled-proposal (dense) PnP.

Equivalent of the reference's dense pipeline
(src/models/utils/matching.py:64-174 `dino_matching`,
src/models/utils/data_processing.py:9-230 `filter_by_neighbor_mask`,
src/models/utils/data_utils.py:5-95 `sub_batchify` /
`fetch_neighbors_by_pose_similarity`,
src/models/utils/dense_processing.py:8-158 `process_multi_round`,
src/models/utils/box_utils.py:202-304 `recover_pose_from_dense_bb8`),
re-designed for XLA: every stage is static-shaped (top-k gathers instead of
boolean indexing; zero-padded sub-batches), so the whole dense decode is one
jittable program with a fixed-hypothesis RANSAC at the end.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from boxdreamer_tpu.models.boxdreamer import BoxDreamer
from boxdreamer_tpu.models.predictor import decoder_apply, encoder_apply
from boxdreamer_tpu.ops import attention as attention_ops
from boxdreamer_tpu.ops import decode as decode_ops
from boxdreamer_tpu.ops import pnp as pnp_ops


@dataclasses.dataclass(frozen=True)
class DenseConfig:
    """Mirrors configs/model/transformer.yaml dense_cfg (reference :25-34).

    Defaults are pinned by on-chip measurement (tools/dense_bench.py, v5e,
    batch 8, 25 refs, chain-slope fetch-timed, round 4):

    * filter_enable=True + multi_round=False (DINO-filter 25 refs to top-5,
      one 6-frame decode): 19.1 ms/query — the fastest configuration and
      the production default.
    * multi_round=True (5 sub-batches of 5 + pooled-proposal RANSAC):
      36.7 ms/query; dense_mem_friendly=True (lax.map) 38.7 — ~5% slower,
      opt-in for VMEM-constrained shapes only.
    * single-shot over ALL 25 refs (26*256 = 6656 tokens, batch 1):
      54.8 ms/query on ONE device — comfortably within a single chip's
      budget, so sp_min_len=4096 only routes genuinely long sequences to
      ring attention; per-device ring steps below that length would be
      latency-dominated (ppermute per KV block) rather than compute-bound.
    """

    enable: bool = False
    filter_enable: bool = True
    filter: str = "dino"  # 'dino' | 'gt-neighbor' | None
    filter_topk: int = 5
    multi_round: bool = False
    sub_batch_size: int = 5
    fine_level: bool = False
    fine_topk: int = 5
    dense_mem_friendly: bool = False  # lax.map over sub-batches (less VMEM)
    ransac_threshold: float = 2.0
    # 256 hypotheses: with whole-proposal outlier rates up to 50%, the
    # chance that zero 6-point subsets are clean is (1-0.5^6)^256 ~= 2%,
    # matching cv2.solvePnPRansac(iterationsCount=1000) success rates on the
    # dense-fidelity golden (tests/parity/test_ransac_golden.py).
    ransac_hypotheses: int = 256
    # Sequence parallelism for very large reference DBs (SURVEY.md §2.5):
    # shard the (T*P)-token decoder sequence over a mesh axis and run ring
    # attention (ops/attention.sequence_parallel_attention). Only engages for
    # sequences >= sp_min_len tokens that divide by the axis size; eval-only.
    sequence_parallel: bool = False
    sp_axis: str = "data"
    sp_min_len: int = 4096


# ---------------------------------------------------------------------------
# Similarity scoring / filtering
# ---------------------------------------------------------------------------


def foreground_mask(images: jax.Array, grid: int, threshold: float = 0.05) -> jax.Array:
    """Luminance-threshold foreground mask at feature resolution
    (reference matching.py:95-110; nearest-neighbor downsample).

    Args:
        images: (..., 3, H, W) in [0, 1].

    Returns:
        (..., grid*grid) float mask.
    """
    lum = (
        0.299 * images[..., 0, :, :]
        + 0.587 * images[..., 1, :, :]
        + 0.114 * images[..., 2, :, :]
    )
    fg = (lum > threshold).astype(jnp.float32)
    H = fg.shape[-2]
    stride = H // grid
    # Nearest downsample: F.interpolate(mode='nearest') picks index
    # floor(i * H / grid) == i * stride for integer ratios.
    ds = fg[..., ::stride, ::stride][..., :grid, :grid]
    return ds.reshape(fg.shape[:-2] + (grid * grid,))


def dino_similarity(
    ref_features: jax.Array,
    query_features: jax.Array,
    ref_images: jax.Array,
    query_images: jax.Array,
    threshold: float = 0.05,
) -> jax.Array:
    """Masked mean cosine similarity query<->each reference
    (reference dino_matching, matching.py:64-174 — including its behavior of
    counting masked pairs at the -1e4 fill value in the mean, which acts as
    a strong penalty for small foreground overlap).

    Args:
        ref_features: (B, N, L, D); query_features: (B, L, D);
        ref_images: (B, N, 3, H, W); query_images: (B, 3, H, W).

    Returns:
        (B, N) mean similarity scores.
    """
    B, N, L, D = ref_features.shape
    grid = int(round(L**0.5))
    q_mask = foreground_mask(query_images, grid, threshold)  # (B, L)
    r_mask = foreground_mask(ref_images, grid, threshold)  # (B, N, L)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    qf = norm(query_features * q_mask[..., None])  # (B, L, D)
    rf = norm(ref_features * r_mask[..., None])  # (B, N, L, D)

    sim = jnp.einsum("bld,bnmd->bnlm", qf, rf)  # (B, N, Lq, Lr)
    valid = q_mask[:, None, :, None] * r_mask[:, :, None, :]
    sim = jnp.where(valid > 0, sim, -1e4)
    mean_sim = sim.mean(axis=(-2, -1))
    return jnp.nan_to_num(mean_sim, nan=0.0, posinf=0.0, neginf=0.0)


def gt_neighbor_score(poses: jax.Array, camera_mask: jax.Array) -> jax.Array:
    """Pose-similarity score of each reference to the query
    (reference make_gt_neighbor_score, matching.py:7-61).

    Args:
        poses: (B, T, 4, 4); camera_mask: (B, T) bool.

    Returns:
        (B, T-1) scores in [0, 1] for the reference frames in order.
    """
    B, T = camera_mask.shape
    mask_f = camera_mask.astype(poses.dtype)
    query = jnp.einsum("btij,bt->bij", poses, mask_f)  # (B, 4, 4)
    order = jnp.argsort(camera_mask, axis=1, stable=True)[:, : T - 1]  # ref idxs
    refs = jnp.take_along_axis(poses, order[:, :, None, None], axis=1)  # (B,T-1,4,4)

    dist = jnp.linalg.norm(query[:, None, :3, 3] - refs[:, :, :3, 3], axis=-1)
    rel = jnp.einsum("bji,bnjk->bnik", query[:, :3, :3], refs[:, :, :3, :3])
    trace = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    ang = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    ang = jnp.nan_to_num(ang, nan=0.0)
    score = jnp.exp(-dist) + jnp.exp(-ang)
    mn = score.min(axis=-1, keepdims=True)
    mx = score.max(axis=-1, keepdims=True)
    return (score - mn) / (mx - mn + 1e-8)


def topk_gather(scores: jax.Array, k: int, *ref_arrays: jax.Array):
    """Select the top-k references by score (static-shape gather, replacing
    the reference's boolean-mask re-packing in data_processing.py:9-230).

    Returns (indices (B, k), gathered arrays each (B, k, ...))."""
    _, idx = jax.lax.top_k(scores, k)
    out = []
    for arr in ref_arrays:
        extra = arr.ndim - 2
        ix = idx.reshape(idx.shape + (1,) * extra)
        out.append(jnp.take_along_axis(arr, ix, axis=1))
    return (idx, *out)


def fetch_neighbors_by_pose_similarity(
    ref_poses: jax.Array, pred_pose: jax.Array, topk: int
) -> jax.Array:
    """Top-k reference indices nearest to a predicted pose
    (reference data_utils.py:97-...): score = exp(-|t diff|) + exp(-angle).

    Args:
        ref_poses: (B, N, 4, 4); pred_pose: (B, 4, 4).

    Returns:
        (B, topk) indices.
    """
    dist = jnp.linalg.norm(
        pred_pose[:, None, :3, 3] - ref_poses[:, :, :3, 3], axis=-1
    )
    rel = jnp.einsum("bji,bnjk->bnik", pred_pose[:, :3, :3], ref_poses[:, :, :3, :3])
    trace = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    ang = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
    score = jnp.exp(-dist) + jnp.exp(-jnp.nan_to_num(ang, nan=0.0))
    idx = jax.lax.top_k(score, topk)[1]
    return idx


# ---------------------------------------------------------------------------
# Multi-round sub-batching
# ---------------------------------------------------------------------------


def sub_batchify(
    ref_bbox_feat: jax.Array,
    ref_tokens: jax.Array,
    query_tokens: jax.Array,
    sub_batch_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Split N references into ceil(N/sub) groups of (sub + 1 query) frames
    (reference sub_batchify, data_utils.py:5-95; zero-padded tail group).

    Args:
        ref_bbox_feat: (B, N, c, H, W); ref_tokens: (B, N, L, D);
        query_tokens: (B, L, D).

    Returns:
        (bbox_feat (B, S, sub+1, c, H, W), tokens (B, S, sub+1, L, D),
         camera_mask (B, S, sub+1) with the query last in each group).
    """
    B, N = ref_bbox_feat.shape[:2]
    S = -(-N // sub_batch_size)
    pad = S * sub_batch_size - N

    def pad_refs(x):
        return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))

    bf = pad_refs(ref_bbox_feat).reshape(
        (B, S, sub_batch_size) + ref_bbox_feat.shape[2:]
    )
    tk = pad_refs(ref_tokens).reshape((B, S, sub_batch_size) + ref_tokens.shape[2:])
    q_bf = jnp.zeros_like(bf[:, :, :1])  # query bbox features are ignored
    q_tk = jnp.broadcast_to(
        query_tokens[:, None, None], (B, S, 1) + query_tokens.shape[1:]
    )
    bf = jnp.concatenate([bf, q_bf], axis=2)
    tk = jnp.concatenate([tk, q_tk], axis=2)
    camera_mask = jnp.zeros((B, S, sub_batch_size + 1), dtype=bool).at[:, :, -1].set(
        True
    )
    return bf, tk, camera_mask


def encode_dense_references(
    model: BoxDreamer, params: Any, ref_images, store: str = "bf16"
):
    """Pre-encode a dense reference DB once for serving.

    ref_images: (N, 3, H, W) — the fixed per-object reference set. Returns
    (N, P, C) encoder tokens to pass as ``dense_predict(...,
    ref_tokens=...)`` (broadcast to the query batch), so per-query cost
    drops from encoding N+1 frames x B to encoding B query frames. The
    on-chip measurement lives in tools/dense_bench.py (--cached-refs).

    ``store='int8'``: hold the cache as symmetric per-row int8 + f32 scales
    (4.1x smaller than bf16) and dequantize to bf16 at dense_predict entry.
    At the production 25-ref DB the bf16 cache is only ~10 MB, so this is a
    CAPACITY lever (thousand-reference DBs), not a speed one — the round-5
    A/B measured parity within noise (tools/dense_bench.py --cached-store
    int8; see CLAUDE.md round-5 notes).
    """
    tokens = encoder_apply(model, params, ref_images)
    if store == "int8":
        from boxdreamer_tpu.ops import quant

        vals, scales = quant.quantize_rows_int8(tokens)
        # 'like' carries the dequant dtype as a zero-size array — a plain
        # dtype string is not a valid jit output type.
        return {
            "int8": vals,
            "scale": scales,
            "like": jnp.zeros((0,), tokens.dtype),
        }
    return tokens


def _materialize_ref_tokens(ref_tokens):
    """Dequantize an int8 token cache (dict from encode_dense_references
    with store='int8'); pass arrays through untouched."""
    if isinstance(ref_tokens, dict) and "int8" in ref_tokens:
        # scale already carries the keepdims trailing 1 (quantize_rows_int8)
        return (
            ref_tokens["int8"].astype(jnp.float32) * ref_tokens["scale"]
        ).astype(ref_tokens["like"].dtype)
    return ref_tokens


def dense_predict(
    model: BoxDreamer,
    params: Any,
    batch: Dict[str, jax.Array],
    dense_cfg: DenseConfig,
    mesh=None,
    ref_tokens=None,
) -> Dict[str, jax.Array]:
    """Dense-reference inference (reference process_dense_input +
    process_multi_round). Jittable for a fixed dense_cfg.

    Batch keys as in forward_with_pose, where T-1 frames are references and
    the query index is T-1 (references first). Returns pred_poses etc.

    ``ref_tokens``: optional precomputed encoder tokens for the T-1
    reference frames, shaped (N, P, C) (shared DB, broadcast over the
    batch) or (B, N, P, C). Serving caches these once per object
    (:func:`encode_dense_references`) — the reference re-encodes its dense
    DB every batch (dense_processing.py:8-40), which is the dominant cost
    of the mode (CLAUDE.md dense numbers); with cached tokens only the B
    query frames hit the encoder per call. EXACT: the encoder is frozen
    and deterministic, so cached tokens equal recomputed ones.

    When ``dense_cfg.sequence_parallel`` and a ``mesh`` is given, the
    single-shot decoder pass (the path whose token count grows with the
    reference-DB size) runs with ring attention sharded over
    ``mesh[dense_cfg.sp_axis]`` — peak per-device attention memory is
    O(T*P / n_devices) and the score matrix never materializes.
    """
    cfg = model.config
    images = batch["images"]
    bbox_feat = batch["bbox_feat"]
    B, T = images.shape[:2]
    N = T - 1

    if ref_tokens is None:
        flat = images.reshape((B * T,) + images.shape[2:])
        tokens = encoder_apply(model, params, flat)
        tokens = tokens.reshape(B, T, tokens.shape[1], tokens.shape[2])
        ref_tokens, q_tokens = tokens[:, :N], tokens[:, N]
    else:
        ref_tokens = _materialize_ref_tokens(ref_tokens)  # int8 cache path
        q_tokens = encoder_apply(model, params, images[:, N])
        if ref_tokens.ndim == 3:  # shared DB -> broadcast over batch
            ref_tokens = jnp.broadcast_to(
                ref_tokens[None], (B,) + ref_tokens.shape
            )
        ref_tokens = ref_tokens.astype(q_tokens.dtype)
    ref_bbox = bbox_feat[:, :N]
    ref_images, q_images = images[:, :N], images[:, N]
    K_q = batch["non_ndc_intrinsics"][:, N].astype(jnp.float32)
    bbox_3d_q = batch["bbox_3d"][:, N].astype(jnp.float32)

    # --- filter ----------------------------------------------------------
    if dense_cfg.filter_enable and N > dense_cfg.filter_topk:
        if dense_cfg.filter == "dino":
            scores = dino_similarity(ref_tokens, q_tokens, ref_images, q_images)
        elif dense_cfg.filter == "gt-neighbor" and "poses" in batch:
            # Oracle filtering by GT pose similarity (reference
            # ref_type 'gt-neighbor', matching.make_gt_neighbor_score).
            camera_mask = jnp.zeros((B, T), dtype=bool).at[:, -1].set(True)
            scores = gt_neighbor_score(
                batch["poses"].astype(jnp.float32), camera_mask
            )
        else:
            scores = None
        if scores is not None:
            _, ref_tokens, ref_bbox = topk_gather(
                scores, dense_cfg.filter_topk, ref_tokens, ref_bbox
            )
            N = dense_cfg.filter_topk

    if not dense_cfg.multi_round:
        tokens_all = jnp.concatenate([ref_tokens, q_tokens[:, None]], axis=1)
        bf_all = jnp.concatenate([ref_bbox, jnp.zeros_like(ref_bbox[:, :1])], axis=1)
        camera_mask = jnp.zeros((B, N + 1), dtype=bool).at[:, -1].set(True)
        if dense_cfg.sequence_parallel and mesh is not None:
            with attention_ops.sequence_parallel_scope(
                mesh, axis=dense_cfg.sp_axis, min_len=dense_cfg.sp_min_len
            ):
                heatmaps = decoder_apply(
                    model, params, bf_all, camera_mask, tokens_all
                )
        else:
            heatmaps = decoder_apply(model, params, bf_all, camera_mask, tokens_all)
        _, kpts = decode_ops.decode_bbox_features(
            heatmaps, cfg.bbox_representation, k=cfg.decode_topk
        )
        poses = pnp_ops.solve_pnp(bbox_3d_q, kpts, K_q, iters=cfg.pnp_iters)
        return {"pred_bbox": heatmaps, "pred_kpts_2d": kpts, "pred_poses": poses}

    # --- multi-round -----------------------------------------------------
    sub = dense_cfg.sub_batch_size
    bf, tk, cm = sub_batchify(ref_bbox, ref_tokens, q_tokens, sub)
    S = bf.shape[1]
    if dense_cfg.dense_mem_friendly:
        # One sub-batch at a time (reference dense_mem_friendly,
        # dense_processing.py:52-66) — lax.map trades speed for peak memory.
        heatmaps = jax.lax.map(
            lambda args: decoder_apply(model, params, args[0], args[1], args[2]),
            (
                jnp.swapaxes(bf, 0, 1),
                jnp.swapaxes(cm, 0, 1),
                jnp.swapaxes(tk, 0, 1),
            ),
        )  # (S, B, c, H, W)
        heatmaps = jnp.swapaxes(heatmaps, 0, 1)
    else:
        heatmaps = decoder_apply(
            model,
            params,
            bf.reshape((B * S,) + bf.shape[2:]),
            cm.reshape(B * S, sub + 1),
            tk.reshape((B * S,) + tk.shape[2:]),
        )  # (B*S, c, H, W)
        heatmaps = heatmaps.reshape((B, S) + heatmaps.shape[1:])

    # Pool proposals: all S x 8 corner observations into one RANSAC PnP
    # (reference recover_pose_from_dense_bb8, box_utils.py:202-304).
    _, kpts = decode_ops.decode_bbox_features(
        heatmaps, cfg.bbox_representation, k=cfg.decode_topk
    )  # (B, S, 8, 2)
    pooled_2d = kpts.reshape(B, S * 8, 2)
    pooled_3d = jnp.broadcast_to(bbox_3d_q[:, None], (B, S, 8, 3)).reshape(B, S * 8, 3)
    poses = pnp_ops.solve_pnp_ransac(
        pooled_3d,
        pooled_2d,
        K_q,
        threshold=dense_cfg.ransac_threshold,
        num_hypotheses=dense_cfg.ransac_hypotheses,
        iters=cfg.pnp_iters,
        group_size=8,  # S proposals x 8 distinct corners
    )

    if dense_cfg.fine_level:
        fine_idx = fetch_neighbors_by_pose_similarity(
            batch["poses"][:, :T - 1].astype(jnp.float32)
            if "poses" in batch
            else jnp.broadcast_to(jnp.eye(4), (B, T - 1, 4, 4)),
            poses,
            dense_cfg.fine_topk,
        )
        ix = fine_idx
        fine_tokens = jnp.take_along_axis(
            ref_tokens, ix[:, :, None, None], axis=1
        )
        fine_bbox = jnp.take_along_axis(
            ref_bbox, ix[:, :, None, None, None], axis=1
        )
        tokens_all = jnp.concatenate([fine_tokens, q_tokens[:, None]], axis=1)
        bf_all = jnp.concatenate(
            [fine_bbox, jnp.zeros_like(fine_bbox[:, :1])], axis=1
        )
        camera_mask = (
            jnp.zeros((B, dense_cfg.fine_topk + 1), dtype=bool).at[:, -1].set(True)
        )
        heat_fine = decoder_apply(model, params, bf_all, camera_mask, tokens_all)
        _, kpts_f = decode_ops.decode_bbox_features(
            heat_fine, cfg.bbox_representation, k=cfg.decode_topk
        )
        poses = pnp_ops.solve_pnp(bbox_3d_q, kpts_f, K_q, iters=cfg.pnp_iters)
        return {"pred_bbox": heat_fine, "pred_kpts_2d": kpts_f, "pred_poses": poses}

    return {
        "pred_bbox": heatmaps[:, 0],
        "pred_kpts_2d": kpts[:, 0],
        "pred_poses": poses,
    }

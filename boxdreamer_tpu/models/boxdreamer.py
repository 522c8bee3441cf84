"""BoxDreamer — the full pose-estimation model as one XLA program.

Top-level equivalent of the reference BoxDreamer nn.Module
(src/models/BoxDreamerModel.py:21-384) plus its eval-time post-processing
(src/models/utils/prediction_utils.py:14-136, box_utils.py:113-199). The
reference splits the pipeline across torch CUDA (encoder+decoder), torch CPU
(keypoint top-k partly), and OpenCV C++ on CPU (per-sample PnP in a Python
double loop). Here `forward_with_pose` is a single jittable function:

    DINOv2 tokens -> BETR heatmaps -> top-k decode -> batched PnP -> poses

so eval never leaves the device, and the whole thing shards over a mesh by
vmapping the batch dimension.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxdreamer_tpu.models.betr import BETR, BETRConfig
from boxdreamer_tpu.models.dinov2 import DinoViT, DinoViTConfig
from boxdreamer_tpu.ops import decode as decode_ops
from boxdreamer_tpu.ops import pnp as pnp_ops


@dataclasses.dataclass(frozen=True)
class BoxDreamerConfig:
    """Mirrors the reference's `modules` config group
    (configs/model/transformer.yaml:13-68)."""

    encoder: str = "dino"  # 'dino' | 'none'
    freeze_encoder: bool = True
    coordinate: str = "object"  # 'object' | 'first_camera'
    pose_representation: str = "bb8"
    bbox_representation: str = "heatmap"
    decode_topk: int = 20
    pnp_iters: int = 20
    # Optional host-side modules (reference BoxDreamerModel.py:44-93):
    # use_tracking raises NotImplementedError in the reference's own forward
    # (:75) — same here; use_matching builds the gated LoFTR wrapper
    # (models/trackers.py) at the runtime layer, never inside the XLA program.
    use_tracking: bool = False
    use_matching: bool = False
    betr: BETRConfig = BETRConfig()
    dino: DinoViTConfig = DinoViTConfig()

    def __post_init__(self):
        if self.use_tracking:
            # Parity with the reference's dead path (BoxDreamerModel.py:75).
            raise NotImplementedError("Tracking is not supported yet")
        object.__setattr__(
            self,
            "betr",
            dataclasses.replace(
                self.betr,
                pose_representation=self.pose_representation,
                bbox_representation=self.bbox_representation,
                use_pretrained=self.encoder != "none",
            ),
        )


class BoxDreamer(nn.Module):
    """Encoder + BETR decoder; returns query-frame bbox feature prediction."""

    config: BoxDreamerConfig = BoxDreamerConfig()

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        bbox_feat: jax.Array,
        camera_mask: jax.Array,
        deterministic: bool = True,
        return_aux: bool = False,
        precomputed_tokens: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Args:
            images: (B, T, 3, H, W) crops in [0, 1].
            bbox_feat: (B, T, box_dim, H, W) reference bbox features.
            camera_mask: (B, T) bool, True at the query frame.
            return_aux: also return the decoder's auxiliary-head dict
                ({'nvs_rgb'} when betr.nvs_supervision).
            precomputed_tokens: (B, T, P, C) encoder tokens computed
                outside this apply (the chunked-encode training path,
                train_step.py:make_train_step encode_chunk) — skips the
                in-graph encoder entirely. Caller owns stop_gradient.

        Returns:
            (B, box_dim, H, W) query heatmaps in [-1, 1]; with return_aux,
            (heatmaps, aux_dict).
        """
        cfg = self.config
        B, T = images.shape[:2]

        rgb_tokens = None
        if precomputed_tokens is not None:
            rgb_tokens = precomputed_tokens
        elif cfg.encoder != "none":
            flat = images.reshape((B * T,) + images.shape[2:])
            if cfg.encoder == "dino":
                tokens = DinoViT(cfg.dino, name="encoder")(flat)
            elif cfg.encoder == "resnet":
                from boxdreamer_tpu.models.resnet import ResNet, ResNetConfig

                tokens = ResNet(
                    ResNetConfig(dtype=cfg.dino.dtype), name="encoder"
                )(flat)
                # layer4 tokens are at stride 32; resize to BETR's patch grid
                # so they align 1:1 with the bbox-feature tokens.
                g = cfg.betr.grid
                side = int(round(tokens.shape[1] ** 0.5))
                if side != g:
                    fm = tokens.reshape(tokens.shape[0], side, side, tokens.shape[-1])
                    fm = jax.image.resize(
                        fm, (tokens.shape[0], g, g, tokens.shape[-1]), "bilinear"
                    )
                    tokens = fm.reshape(tokens.shape[0], g * g, tokens.shape[-1])
            elif cfg.encoder == "spa":
                # Declared-but-unimplemented in the reference too
                # (BoxDreamerModel.py:102-103).
                raise NotImplementedError("SPA encoder is not supported yet")
            else:
                raise ValueError(f"Invalid encoder name: {cfg.encoder}")
            if cfg.freeze_encoder:
                # Frozen encoder (reference dinov2.py:48 predict under
                # no_grad) — cut gradients, keep params out of the trainable
                # partition (see training/optim.py).
                tokens = jax.lax.stop_gradient(tokens)
            rgb_tokens = tokens.reshape(B, T, tokens.shape[1], tokens.shape[2])

        return BETR(cfg.betr, name="decoder")(
            bbox_feat,
            images,
            camera_mask,
            pretrain_rgb_feat=rgb_tokens,
            deterministic=deterministic,
            return_aux=return_aux,
        )


def camera_mask_from_query_idx(query_idx: jax.Array, T: int) -> jax.Array:
    """One-hot bool mask (reference BoxDreamerModel.py:204-210)."""
    return jax.nn.one_hot(query_idx, T, dtype=jnp.bool_)


def forward_with_pose(
    model: BoxDreamer,
    params: Any,
    batch: Dict[str, jax.Array],
) -> Dict[str, jax.Array]:
    """Full eval forward: heatmaps -> keypoints -> PnP pose. Jittable.

    Args (batch keys, mirroring the reference batch dict base.py:725-752):
        images: (B, T, 3, H, W); bbox_feat: (B, T, c, H, W);
        query_idx: (B,) int; bbox_3d: (B, T, 8, 3);
        non_ndc_intrinsics: (B, T, 3, 3).

    Returns dict with pred_bbox (query heatmaps), pred_kpts_2d,
    pred_kpts_2d_normalized, and pred_poses (B, 4, 4) for the query frame.
    """
    cfg = model.config
    B, T = batch["images"].shape[:2]
    camera_mask = camera_mask_from_query_idx(batch["query_idx"], T)

    aux = {}
    if cfg.betr.nvs_supervision:
        # NVS variant: also surface the decoded query image so the image
        # metric branch (reference rgb_metrics 'pred_images') can score it.
        heatmaps, aux = model.apply(
            params, batch["images"], batch["bbox_feat"], camera_mask,
            return_aux=True,
        )
    else:
        heatmaps = model.apply(
            params, batch["images"], batch["bbox_feat"], camera_mask
        )  # (B, c, H, W)

    norm_kpts, kpts = decode_ops.decode_bbox_features(
        heatmaps, cfg.bbox_representation, k=cfg.decode_topk
    )  # (B, 8, 2)

    # Query-frame 3D box and intrinsics via one-hot contraction (jit-static).
    mask_f = camera_mask.astype(jnp.float32)
    bbox_3d_q = jnp.einsum("btnc,bt->bnc", batch["bbox_3d"].astype(jnp.float32), mask_f)
    K_q = jnp.einsum(
        "btij,bt->bij", batch["non_ndc_intrinsics"].astype(jnp.float32), mask_f
    )

    poses = pnp_ops.solve_pnp(bbox_3d_q, kpts, K_q, iters=cfg.pnp_iters)

    out = {
        "pred_bbox": heatmaps,
        "pred_kpts_2d": kpts,
        "pred_kpts_2d_normalized": norm_kpts,
        "pred_poses": poses,
    }
    if "nvs_rgb" in aux:
        out["nvs_rgb"] = aux["nvs_rgb"]
    return out


def forward_with_pose_rays(
    model: BoxDreamer,
    params: Any,
    batch: Dict[str, jax.Array],
) -> Dict[str, jax.Array]:
    """Eval forward for the Plücker representation (reference
    rotation_type='ray' path: BoxDreamerModel._prepare_camera_representation
    :231-257 + process_prediction's ray branch): reference frames' rays are
    built from their poses, the query's rays from an identity pose, and the
    predicted query rays are converted back to a pose. Jittable.

    Batch keys: images (B,T,3,H,W); poses (B,T,4,4); non_ndc_intrinsics
    (B,T,3,3); query_idx (B,).
    """
    from boxdreamer_tpu.models import camera_repr

    cfg = model.config
    B, T = batch["images"].shape[:2]
    camera_mask = camera_mask_from_query_idx(batch["query_idx"], T)

    # Mask query poses to identity (BoxDreamerModel.py:221-226).
    masked_poses = jnp.where(
        camera_mask[:, :, None, None],
        jnp.eye(4, dtype=batch["poses"].dtype),
        batch["poses"],
    )
    K = batch["non_ndc_intrinsics"].astype(jnp.float32)
    rays = camera_repr.make_camera_rays(
        masked_poses.astype(jnp.float32),
        K,
        image_size=cfg.betr.img_size,
        patch_size=cfg.betr.patch_size,
    )
    pred_rays = model.apply(params, batch["images"], rays, camera_mask)  # (B,6,g,g)

    mask_f = camera_mask.astype(jnp.float32)
    K_q = jnp.einsum("btij,bt->bij", K, mask_f)
    pose_q = camera_repr.recover_pose_from_rays(
        pred_rays[:, None], K_q[:, None], image_size=cfg.betr.img_size,
        coordinate="object",
    )[:, 0]
    return {"pred_camera_rays": pred_rays, "pred_poses": pose_q}

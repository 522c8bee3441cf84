"""Sharded training / evaluation steps.

Equivalent of the reference LightningModule's training_step/validation_step
(src/lightning/BoxDreamer_lightning_model.py:88-162) re-designed as pure
functions: `(state, batch, rng) -> (state, metrics)` jitted once and sharded
over a ('data', 'model') mesh. DDP gradient sync (NCCL all-reduce under
Lightning) is replaced by GSPMD: batch sharded on 'data' + replicated params
=> XLA inserts the gradient all-reduce automatically; tensor-parallel weights
shard on 'model' via boxdreamer_tpu.parallel.mesh rules.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from boxdreamer_tpu.models.boxdreamer import (
    BoxDreamer,
    camera_mask_from_query_idx,
    forward_with_pose,
)
from boxdreamer_tpu.parallel import mesh as mesh_lib
from boxdreamer_tpu.training.loss import Loss
from boxdreamer_tpu.training.optim import OptimConfig, build_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def ensure_bbox_feat(batch: Dict[str, jax.Array], model: BoxDreamer) -> Dict:
    """Generate bbox feature maps on device from the (B, T, 8, 2) pixel
    projections when the loader shipped only those
    (DatasetConfig.device_bbox_feat) — the jittable twin of the host
    pipeline's make_bbox_features."""
    if "bbox_feat" in batch:
        return batch
    from boxdreamer_tpu.ops.heatmap import make_bbox_features

    S = model.config.betr.img_size
    feat = make_bbox_features(
        batch["bbox_proj_pix"], model.config.bbox_representation, S, S
    )
    return dict(batch, bbox_feat=feat)


def gather_query_frame(x: jax.Array, query_idx: jax.Array) -> jax.Array:
    """Select each row's query-frame slice: (B, T, ...) -> (B, ...)."""
    B = x.shape[0]
    q = query_idx.reshape((B, 1) + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, q, axis=1)[:, 0]


def scatter_query_prediction(
    bbox_feat: jax.Array, query_pred: jax.Array, camera_mask: jax.Array
) -> jax.Array:
    """Insert the (B, c, H, W) query prediction into a (B, T, c, H, W) copy of
    the GT features (reference BoxDreamerModel._update_predictions,
    BoxDreamerModel.py:335-348) — `where` instead of masked assignment."""
    return jnp.where(
        camera_mask[:, :, None, None, None], query_pred[:, None], bbox_feat
    )


def create_train_state(
    model: BoxDreamer,
    optim_cfg: OptimConfig,
    rng: jax.Array,
    sample_batch: Dict[str, jax.Array],
    mesh=None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize params (+optimizer) — optionally directly sharded on a mesh
    so large models never materialize replicated."""
    sample_batch = ensure_bbox_feat(sample_batch, model)
    B, T = sample_batch["images"].shape[:2]
    camera_mask = camera_mask_from_query_idx(sample_batch["query_idx"], T)

    def init_fn(rng):
        return model.init(
            rng, sample_batch["images"], sample_batch["bbox_feat"], camera_mask
        )

    if mesh is not None:
        shapes = jax.eval_shape(init_fn, rng)
        shardings = mesh_lib.param_shardings(mesh, shapes)
        params = jax.jit(init_fn, out_shardings=shardings)(rng)
    else:
        params = jax.jit(init_fn)(rng)

    tx = build_optimizer(optim_cfg, params)
    opt_state = tx.init(params)
    return TrainState(step=jnp.asarray(0), params=params, opt_state=opt_state), tx


def make_train_step(
    model: BoxDreamer,
    loss: Loss,
    tx: optax.GradientTransformation,
    deterministic: bool = False,
    encode_chunk: int = 0,
) -> Callable:
    """Build the jitted train step.

    ``deterministic=True`` disables dropout inside the forward — used by the
    twin-training dynamics golden (tests/parity/test_train_twin.py), which
    compares loss trajectories against the real reference trainer where
    stochastic dropout cannot be seed-matched across frameworks.

    ``encode_chunk``: run the FROZEN encoder over the (B*T) image stack in
    sequential chunks of this many images (jax.lax.map) instead of one
    batched call. At the flagship train shape the batched B*T=48 DINOv2
    forward is HBM-superlinear (24.2 ms vs 6 x 3.06 ms at B=8 — CLAUDE.md
    round-4 close-out), so chunking trades defeated parallelism for cache
    locality. EXACT (the encoder is frozen + deterministic); 0 disables.
    Only valid when the model's encoder is frozen — gradients do not flow
    through lax.map'd tokens (stop_gradient is applied, matching the
    in-graph frozen-encoder path). Single-device knob: with a DP-sharded
    batch the (B*T) reshape would reshuffle across devices — leave 0 on a
    mesh unless measured."""

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        batch = ensure_bbox_feat(batch, model)
        T = batch["images"].shape[1]
        camera_mask = camera_mask_from_query_idx(batch["query_idx"], T)

        needs_regression_boxes = any(
            t.pred_key == "regression_boxes" for t in loss.terms
        )
        # NVS-supervision consumer: a loss term reading 'nvs_rgb' drives the
        # decoder's rgb_proj head (reference betr.py:133-134; the perceptual
        # term mirrors reference loss.py:29-30).
        needs_nvs = model.config.betr.nvs_supervision and any(
            t.pred_key == "nvs_rgb" for t in loss.terms
        )

        use_chunked_encode = (
            encode_chunk > 0
            # encoder_apply is the DINOv2 submodule runner; resnet configs
            # take the in-graph path (its token-grid resize lives there).
            and model.config.encoder == "dino"
            and model.config.freeze_encoder
            and (batch["images"].shape[0] * batch["images"].shape[1])
            > encode_chunk
            and (batch["images"].shape[0] * batch["images"].shape[1])
            % encode_chunk == 0
        )

        def loss_fn(params):
            tokens = None
            if use_chunked_encode:
                from boxdreamer_tpu.models.predictor import encoder_apply

                imgs = batch["images"]
                B_, T_ = imgs.shape[:2]
                chunks = imgs.reshape(
                    (-1, encode_chunk) + imgs.shape[2:]
                )
                toks = jax.lax.map(
                    lambda c: encoder_apply(model, params, c), chunks
                )  # (n_chunks, chunk, P, C)
                tokens = jax.lax.stop_gradient(
                    toks.reshape((B_, T_) + toks.shape[2:])
                )
            pred = model.apply(
                params,
                batch["images"],
                batch["bbox_feat"],
                camera_mask,
                deterministic=deterministic,
                rngs={"dropout": rng},
                return_aux=needs_nvs,
                precomputed_tokens=tokens,
            )
            aux = {}
            if needs_nvs:
                pred, aux = pred
            if loss.query_frame_only and not needs_regression_boxes:
                # Query-only fast path (exact — see Loss.query_frame_only):
                # evaluate the masked loss on (B, 1, ...) query slices
                # instead of scattering the prediction into a full
                # (B, T, c, H, W) copy the mask immediately zeroes.
                B = pred.shape[0]
                q = batch["query_idx"].reshape(B, 1, 1, 1, 1)
                gt_q = jnp.take_along_axis(batch["bbox_feat"], q, axis=1)
                return loss(
                    {
                        "pred_bbox": pred[:, None],
                        "bbox_feat": gt_q,
                        "camera_mask": jnp.ones((B, 1), dtype=bool),
                    }
                )
            data = dict(batch)
            data["pred_bbox"] = scatter_query_prediction(
                batch["bbox_feat"], pred, camera_mask
            )
            data["camera_mask"] = camera_mask
            if needs_nvs:
                data["nvs_rgb"] = aux["nvs_rgb"]
                # GT: the query frame's RGB crop.
                data["nvs_rgb_gt"] = gather_query_frame(
                    batch["images"], batch["query_idx"]
                )
            if needs_regression_boxes and "bbox_proj_crop" in batch:
                # Optional keypoint-regression term (reference
                # calculate_bb8_projections, prediction_utils.py:106-136, and
                # the commented regression_boxes loss in
                # configs/model/loss/default.yaml). Soft-argmax keeps the
                # decode differentiable end-to-end (TPU-native improvement
                # over the reference's hard top-k).
                from boxdreamer_tpu.ops.decode import decode_heatmap_soft_argmax

                norm_kpts, _ = decode_heatmap_soft_argmax(pred)
                data["regression_boxes"] = jnp.where(
                    camera_mask[:, :, None, None],
                    norm_kpts[:, None],
                    batch["bbox_proj_crop"],
                )
            return loss(data)

        (total, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        metrics = {"loss": total, **{f"loss/{k}": v for k, v in details.items()}}
        return new_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,))
    vgg_params = getattr(loss, "_perceptual", None)
    if vgg_params is None:
        return jitted
    vgg_params = vgg_params.params

    def train_step_with_vgg(state, batch, rng):
        # Inject the VGG tree as a traced ARGUMENT (via the batch pytree)
        # outside the jit boundary — closure capture would bake ~59 MB of
        # literals into the HLO and 413 the axon remote compile (CLAUDE.md).
        batch = dict(batch)
        batch["_vgg_params"] = vgg_params
        return jitted(state, batch, rng)

    return train_step_with_vgg


def make_eval_step(model: BoxDreamer, loss: Optional[Loss] = None) -> Callable:
    """Jitted eval step: full forward (heatmaps -> PnP poses) + optional loss."""

    def eval_step(params, batch):
        batch = ensure_bbox_feat(batch, model)
        out = forward_with_pose(model, params, batch)
        metrics = {}
        if loss is not None:
            T = batch["images"].shape[1]
            camera_mask = camera_mask_from_query_idx(batch["query_idx"], T)
            data = dict(batch)
            data["pred_bbox"] = scatter_query_prediction(
                batch["bbox_feat"], out["pred_bbox"], camera_mask
            )
            data["camera_mask"] = camera_mask
            if "nvs_rgb" in out:
                data["nvs_rgb"] = out["nvs_rgb"]
                data["nvs_rgb_gt"] = gather_query_frame(
                    batch["images"], batch["query_idx"]
                )
            total, _ = loss(data)
            metrics["val_loss"] = total
        return out, metrics

    jitted = jax.jit(eval_step)
    vgg = getattr(loss, "_perceptual", None)
    if vgg is None:
        return jitted
    vgg_params = vgg.params

    def eval_step_with_vgg(params, batch):
        batch = dict(batch)
        batch["_vgg_params"] = vgg_params  # traced arg, not HLO literals
        return jitted(params, batch)

    return eval_step_with_vgg

"""Config-driven loss registry (pure JAX).

Equivalent of the reference's Loss module (src/loss/loss.py:8-73) and its
CornerNet focal loss (src/loss/utils/focal_loss.py:6-59): each configured
entry picks a base loss, a pred/gt key pair in the batch dict, and a
[w_query, w_ref] weighting applied through the (B, T) camera_mask. All
losses are jittable scalars; the masked selection uses `where` + mean
renormalization instead of boolean fancy-indexing so shapes stay static.

Default config (configs/model/loss/default.yaml:1-29 in the reference):
one smooth_l1 term on pred_bbox vs bbox_feat, query frames only.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


# --- elementwise base losses -------------------------------------------------


def mse(pred, gt):
    return (pred - gt) ** 2


def l1(pred, gt):
    return jnp.abs(pred - gt)


def smooth_l1(pred, gt, beta: float = 1.0):
    """torch.nn.SmoothL1Loss semantics (beta=1)."""
    d = jnp.abs(pred - gt)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def huber(pred, gt, delta: float = 1.0):
    """torch.nn.HuberLoss semantics (delta=1)."""
    d = jnp.abs(pred - gt)
    return jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))


def bce_with_logits(pred, gt):
    return jnp.maximum(pred, 0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def cross_entropy(pred_logits, gt_labels):
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    return -jnp.take_along_axis(logp, gt_labels[..., None], axis=-1)[..., 0]


def cornernet_focal(pred, gt, alpha: float = 2.0, beta: float = 4.0):
    """CornerNet keypoint focal loss on [-1, 1] heatmaps
    (reference focal_loss.py:18-59). Returns a scalar (it owns its own
    positive-count normalization, unlike the elementwise losses)."""
    pred = (pred.astype(jnp.float32) + 1.0) / 2.0
    gt = (gt.astype(jnp.float32) + 1.0) / 2.0
    pred = jnp.clip(pred, 1e-4, 1.0 - 1e-4)

    pos_mask = (gt == 1.0).astype(jnp.float32)
    pos_loss = ((1.0 - pred) ** alpha) * jnp.log(pred + 1e-9) * pos_mask
    neg_weights = (1.0 - gt) ** beta
    neg_loss = (pred**alpha) * jnp.log1p(-pred + 1e-9) * (1.0 - pos_mask) * neg_weights

    num_pos = pos_mask.sum()
    total = pos_loss.sum() + neg_loss.sum()
    return jnp.where(num_pos > 0, -total / jnp.maximum(num_pos, 1.0), -neg_loss.sum())


_ELEMENTWISE: Dict[str, Callable] = {
    "mse": mse,
    "l1": l1,
    "smooth_l1": smooth_l1,
    "huber": huber,
    "bce": bce_with_logits,
}
_SCALAR: Dict[str, Callable] = {
    "focal": cornernet_focal,
    "cross_entropy": lambda p, g: cross_entropy(p, g).mean(),
}


@dataclasses.dataclass(frozen=True)
class LossTerm:
    """One entry of the loss config (type/weight/pred_key/gt_key/mask_key)."""

    type: str = "smooth_l1"
    weight: Tuple[float, float] = (1.0, 0.0)  # (w_query, w_ref)
    pred_key: str = "pred_bbox"
    gt_key: str = "bbox_feat"
    mask_key: str = "camera_mask"


def _masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of `values` over entries where (B, T) `mask` is True.

    `values` has shape (B, T, ...); equivalent to the reference's
    `loss_fn(pred[mask], gt[mask])` reduction."""
    m = mask.astype(values.dtype)
    extra = values.ndim - m.ndim
    m = m.reshape(m.shape + (1,) * extra)
    denom = m.sum() * jnp.prod(jnp.asarray(values.shape[2:], dtype=values.dtype))
    return (values * m).sum() / jnp.maximum(denom, 1.0)


class Loss:
    """Callable loss over the batch dict: returns (total, per-term dict)."""

    def __init__(
        self,
        terms: Sequence[LossTerm] = (LossTerm(),),
        perceptual_params=None,
    ):
        self.terms = tuple(terms)
        self._perceptual = None
        for t in self.terms:
            if t.type == "PerceptualLoss":
                # VGG16 perceptual distance for the NVS-supervision head
                # (reference loss.py:29-30 builds PerceptualLoss() for such
                # terms). perceptual_params: optional converted torchvision
                # VGG16 weights; random features otherwise (still a valid
                # distance — training/perceptual.py docstring).
                from boxdreamer_tpu.training.perceptual import PerceptualLoss

                self._perceptual = PerceptualLoss(params=perceptual_params)
            elif t.type not in _ELEMENTWISE and t.type not in _SCALAR:
                raise ValueError(f"Unsupported loss type: {t.type}")

    @property
    def query_frame_only(self) -> bool:
        """True when every term is an elementwise pred_bbox-vs-bbox_feat
        loss with zero reference-frame weight — the reference's default
        training loss. Then the loss depends ONLY on the query frame, and
        the train step may evaluate it on (B, 1, ...) query slices instead
        of scattering the prediction into the full (B, T, c, H, W) tensor
        (exact: _masked_mean's numerator and denominator both restrict to
        mask==True entries). At flagship shape the full-tensor path moves
        ~0.5 GB/step of HBM (the 77 MB (8,6,8,224,224) f32 tensor across
        scatter-write, loss read, and backward passes) for values the mask
        then zeroes."""
        return all(
            t.type in _ELEMENTWISE
            and t.weight[1] == 0.0
            and t.pred_key == "pred_bbox"
            and t.gt_key == "bbox_feat"
            and t.mask_key == "camera_mask"
            for t in self.terms
        )

    def __call__(self, data: Dict[str, jax.Array]):
        total = jnp.asarray(0.0, dtype=jnp.float32)
        details: Dict[str, jax.Array] = {}
        for term in self.terms:
            pred = data[term.pred_key].astype(jnp.float32)
            gt = data[term.gt_key].astype(jnp.float32)
            mask = data.get(term.mask_key) if term.mask_key else None

            if term.type == "PerceptualLoss":
                # pred/gt are query-frame images (B, 3, H, W); no masking —
                # the NVS head already decodes only the query tokens. The
                # VGG params ride the data dict ('_vgg_params', injected by
                # make_train_step OUTSIDE the jit boundary) so they trace
                # as arguments, not 59 MB of HLO literals (remote-compile
                # 413 gotcha).
                loss = self._perceptual(
                    pred, gt, params=data.get("_vgg_params")
                ) * term.weight[0]
            elif term.type in _SCALAR:
                # Scalar losses are applied to query frames only via mask==1
                # pre-selection with where (content at ref frames zeroed).
                fn = _SCALAR[term.type]
                if mask is not None:
                    m = mask.reshape(mask.shape + (1,) * (pred.ndim - mask.ndim))
                    loss = fn(jnp.where(m, pred, 0.0), jnp.where(m, gt, 0.0))
                else:
                    loss = fn(pred, gt)
                loss = loss * term.weight[0]
            else:
                fn = _ELEMENTWISE[term.type]
                values = fn(pred, gt)
                if mask is not None and values.shape[: mask.ndim] != mask.shape:
                    # A (B, T) frame mask cannot weight an image-shaped
                    # (B, 3, H, W) prediction — broadcasting would silently
                    # weight CHANNELS when T happens to equal 3. Query-only
                    # image terms (nvs_rgb) must set mask_key: ''.
                    raise ValueError(
                        f"loss term {term.type!r} on {term.pred_key!r}: mask "
                        f"{mask.shape} does not align with leading dims of "
                        f"values {values.shape}; set mask_key: '' for "
                        "query-only image terms"
                    )
                if mask is not None:
                    loss = jnp.asarray(0.0, dtype=jnp.float32)
                    if term.weight[0] != 0.0:
                        loss = loss + term.weight[0] * _masked_mean(values, mask)
                    if term.weight[1] != 0.0:
                        loss = loss + term.weight[1] * _masked_mean(
                            values, jnp.logical_not(mask)
                        )
                else:
                    loss = values.mean() * term.weight[0]

            total = total + loss
            details[term.pred_key] = details.get(term.pred_key, 0.0) + loss
        return total, details


def from_config(cfg: Sequence[dict]) -> Loss:
    """Build from a list of dicts (the YAML `losses:` entries)."""
    terms = [
        LossTerm(
            type=e.get("type", "smooth_l1"),
            weight=tuple(e.get("weight", (1.0, 0.0))),
            pred_key=e.get("pred_key", "pred_bbox"),
            gt_key=e.get("gt_key", "bbox_feat"),
            mask_key=e.get("mask_key", "camera_mask"),
        )
        for e in cfg
    ]
    return Loss(terms)

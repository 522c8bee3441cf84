"""Golden loss parity: execute the REAL reference loss code
(/root/reference/src/loss/loss.py + utils/focal_loss.py) under torch-CPU and
assert our JAX Loss produces the same totals on identical inputs."""

import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.parity import refshim

from boxdreamer_tpu.training import loss as jloss


def _term(**kw):
    d = dict(type="smooth_l1", pred_key="pred_bbox", gt_key="bbox_feat",
             mask_key=None, weight=1.0)
    d.update(kw)
    return types.SimpleNamespace(**d)


def _ref_loss(terms):
    mod = refshim.load("src.loss.loss")
    cfg = types.SimpleNamespace(losses=terms)
    return mod.Loss(cfg)


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def test_smooth_l1_unmasked_matches_reference():
    pred = _rand((2, 3, 8, 16, 16), 0)
    gt = _rand((2, 3, 8, 16, 16), 1)
    ref = _ref_loss([_term(weight=0.7)])
    total_ref, details_ref = ref(
        {"pred_bbox": torch.from_numpy(pred), "bbox_feat": torch.from_numpy(gt)}
    )
    ours = jloss.Loss([jloss.LossTerm(weight=(0.7, 0.0), mask_key="")])
    total, details = ours({"pred_bbox": jnp.asarray(pred), "bbox_feat": jnp.asarray(gt)})
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)
    np.testing.assert_allclose(
        float(details["pred_bbox"]), details_ref["pred_bbox"], rtol=1e-5
    )


@pytest.mark.parametrize("w_query,w_ref", [(1.0, 0.0), (0.6, 0.4), (0.0, 1.0)])
def test_masked_weighting_matches_reference(w_query, w_ref):
    """Query/ref masked weighting: the reference fancy-indexes pred[mask];
    ours uses where + renormalized mean — totals must agree exactly."""
    B, T = 2, 4
    pred = _rand((B, T, 8, 8, 8), 2)
    gt = _rand((B, T, 8, 8, 8), 3)
    mask = np.zeros((B, T), dtype=bool)
    mask[:, -1] = True  # query last
    ref = _ref_loss([_term(mask_key="camera_mask", weight=[w_query, w_ref])])
    total_ref, _ = ref(
        {
            "pred_bbox": torch.from_numpy(pred),
            "bbox_feat": torch.from_numpy(gt),
            "camera_mask": torch.from_numpy(mask),
        }
    )
    ours = jloss.Loss([jloss.LossTerm(weight=(w_query, w_ref))])
    total, _ = ours(
        {
            "pred_bbox": jnp.asarray(pred),
            "bbox_feat": jnp.asarray(gt),
            "camera_mask": jnp.asarray(mask),
        }
    )
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)


@pytest.mark.parametrize(
    "ltype,ours_type",
    [("mse", "mse"), ("l1", "l1"), ("huber", "huber"), ("bce", "bce")],
)
def test_other_base_losses_match_reference(ltype, ours_type):
    pred = _rand((1, 2, 4, 6, 6), 4)
    gt = _rand((1, 2, 4, 6, 6), 5)
    if ltype == "bce":
        gt = (gt > 0).astype(np.float32)
    ref = _ref_loss([_term(type=ltype, weight=1.0)])
    total_ref, _ = ref(
        {"pred_bbox": torch.from_numpy(pred), "bbox_feat": torch.from_numpy(gt)}
    )
    ours = jloss.Loss([jloss.LossTerm(type=ours_type, weight=(1.0, 0.0), mask_key="")])
    total, _ = ours({"pred_bbox": jnp.asarray(pred), "bbox_feat": jnp.asarray(gt)})
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)


def test_focal_loss_matches_reference():
    """CornerNet focal: the reference renormalizes [-1,1]->[0,1] heatmaps
    inside FocalLoss (focal_loss.py) — run the REAL class."""
    focal_mod = refshim.load("src.loss.utils.focal_loss")
    rng = np.random.default_rng(7)
    pred = rng.uniform(-0.999, 0.999, (2, 3, 8, 12, 12)).astype(np.float32)
    gt = rng.uniform(-1.0, 1.0, (2, 3, 8, 12, 12)).astype(np.float32)
    # Sprinkle exact-1 peaks (the positive class in CornerNet focal).
    gt.reshape(-1)[::37] = 1.0

    ref_val = focal_mod.FocalLoss()(torch.from_numpy(pred), torch.from_numpy(gt))
    ours_val = jloss.cornernet_focal(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(float(ours_val), float(ref_val), rtol=1e-4)


def test_multi_term_total_matches_reference():
    """Terms use DISTINCT pred_keys: the reference's Loss keys its function
    table by pred_key (loss.py:15-37), so two terms sharing a pred_key both
    silently run the LAST term's loss function — a reference quirk our
    per-term design intentionally does not reproduce."""
    pred = _rand((1, 3, 8, 8, 8), 8)
    pred2 = _rand((1, 3, 8, 8, 8), 10)
    gt = _rand((1, 3, 8, 8, 8), 9)
    mask = np.zeros((1, 3), dtype=bool)
    mask[:, -1] = True
    data_t = {
        "pred_bbox": torch.from_numpy(pred),
        "pred_aux": torch.from_numpy(pred2),
        "bbox_feat": torch.from_numpy(gt),
        "camera_mask": torch.from_numpy(mask),
    }
    ref = _ref_loss(
        [
            _term(mask_key="camera_mask", weight=[1.0, 0.1]),
            _term(type="mse", pred_key="pred_aux", weight=[0.5, 0.0],
                  mask_key="camera_mask"),
        ]
    )
    total_ref, _ = ref(data_t)
    ours = jloss.Loss(
        [
            jloss.LossTerm(weight=(1.0, 0.1)),
            jloss.LossTerm(type="mse", pred_key="pred_aux", weight=(0.5, 0.0)),
        ]
    )
    total, _ = ours(
        {
            "pred_bbox": jnp.asarray(pred),
            "pred_aux": jnp.asarray(pred2),
            "bbox_feat": jnp.asarray(gt),
            "camera_mask": jnp.asarray(mask),
        }
    )
    np.testing.assert_allclose(float(total), float(total_ref), rtol=1e-5)

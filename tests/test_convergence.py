"""Learning-convergence test: the full training loop must actually learn.

Trains a tiny BoxDreamer on the synthetic fixture for ~120 steps and
asserts a large loss drop plus an improvement in decoded keypoint error —
the closed-loop check that data pipeline, model, loss, and optimizer fit
together (beyond per-module unit tests).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.data.loader import DataLoader
from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx
from boxdreamer_tpu.ops import decode as decode_ops
from boxdreamer_tpu.training.loss import Loss
from boxdreamer_tpu.training.optim import OptimConfig
from boxdreamer_tpu.training.train_step import create_train_state, make_train_step

S = 56
KEYS = ("images", "bbox_feat", "query_idx")


def kpt_err(model, params, ds, n=4):
    errs = []
    for i in range(n):
        b = ds[i]
        q = int(b["query_idx"])
        mask = camera_mask_from_query_idx(jnp.asarray([q]), b["images"].shape[0])
        hm = model.apply(
            params,
            jnp.asarray(b["images"])[None],
            jnp.asarray(b["bbox_feat"])[None],
            mask,
        )
        _, kpts = decode_ops.decode_heatmap_topk(hm)
        gt = (b["bbox_proj_crop"][q] + 1) / 2 * S
        errs.append(float(np.abs(np.asarray(kpts[0]) - gt).mean()))
    return float(np.mean(errs))


def test_training_reduces_loss_and_keypoint_error(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=24, n_test=2)
    ds = build_dataset("LINEMOD", DatasetConfig(image_size=S, length=3), "train",
                       root=root)
    model = BoxDreamer(
        BoxDreamerConfig(
            betr=BETRConfig(
                d_model=64, nhead=4, num_decoder_layers=2, patch_size=14,
                img_size=S, dtype="float32",
            ),
            dino=DinoViTConfig(
                img_size=S, patch_size=14, embed_dim=64, depth=2, num_heads=4,
                dtype="float32",
            ),
            pnp_iters=5,
        )
    )
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    first = next(iter(loader))
    sample = {k: jnp.asarray(first[k]) for k in KEYS}
    state, tx = create_train_state(
        model, OptimConfig(lr=3e-3, use_warmup=False, scheduler="constant"),
        jax.random.PRNGKey(0), sample,
    )
    step = make_train_step(model, Loss(), tx)

    err_before = kpt_err(model, state.params, ds)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(20):  # 20 epochs x 6 steps
        for batch in loader:
            db = {k: jnp.asarray(batch[k]) for k in KEYS}
            rng, sub = jax.random.split(rng)
            state, m = step(state, db, sub)
            losses.append(float(m["loss"]))
    err_after = kpt_err(model, state.params, ds)

    assert np.mean(losses[-5:]) < losses[0] / 5, (losses[0], np.mean(losses[-5:]))
    assert err_after < err_before, (err_before, err_after)

"""Test the optional regression_boxes loss term (soft-argmax keypoint
regression, the reference's commented-out second loss entry)."""

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.training.loss import Loss, LossTerm
from boxdreamer_tpu.training.optim import OptimConfig
from boxdreamer_tpu.training.train_step import create_train_state, make_train_step

TINY = BoxDreamerConfig(
    betr=BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    ),
    dino=DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
        dtype="float32",
    ),
)


def test_regression_boxes_loss_trains():
    model = BoxDreamer(TINY)
    B, T = 2, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = {
        "images": jax.random.uniform(ks[0], (B, T, 3, 28, 28)),
        "bbox_feat": jax.random.uniform(ks[1], (B, T, 8, 28, 28)) * 2 - 1,
        "query_idx": jnp.array([T - 1] * B),
        "bbox_proj_crop": jax.random.uniform(ks[2], (B, T, 8, 2)) * 2 - 1,
    }
    loss = Loss(
        [
            LossTerm(type="smooth_l1", weight=(1.0, 0.0)),
            LossTerm(
                type="smooth_l1",
                weight=(2.0, 0.0),
                pred_key="regression_boxes",
                gt_key="bbox_proj_crop",
            ),
        ]
    )
    state, tx = create_train_state(
        model, OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant"),
        ks[3], batch,
    )
    step = make_train_step(model, loss, tx)
    losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.PRNGKey(i + 5))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
        assert "loss/regression_boxes" in m
    assert losses[-1] < losses[0]

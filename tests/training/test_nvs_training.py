"""NVS-supervision end-to-end: the rgb_proj head (reference betr.py:133-134)
is driven through the train step and supervised by the VGG16 perceptual loss
(reference loss.py:29-30 builds PerceptualLoss for such terms) — the
consumer the reference wires up in config but never executes in forward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models import (
    BETRConfig,
    BoxDreamer,
    BoxDreamerConfig,
    DinoViTConfig,
)
from boxdreamer_tpu.training.loss import Loss, LossTerm
from boxdreamer_tpu.training.optim import OptimConfig
from boxdreamer_tpu.training.train_step import create_train_state, make_train_step

S = 28  # 2x2 patch grid


def _model():
    return BoxDreamer(
        BoxDreamerConfig(
            betr=BETRConfig(
                d_model=32, nhead=2, num_decoder_layers=1, patch_size=14,
                img_size=S, dtype="float32", nvs_supervision=True,
            ),
            dino=DinoViTConfig(
                img_size=S, patch_size=14, embed_dim=32, depth=1, num_heads=2,
                dtype="float32",
            ),
            pnp_iters=3,
        )
    )


def _batch(B=2, T=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(
            rng.uniform(0, 1, (B, T, 3, S, S)).astype(np.float32)
        ),
        "bbox_feat": jnp.asarray(
            rng.uniform(-1, 1, (B, T, 8, S, S)).astype(np.float32)
        ),
        "query_idx": jnp.full((B,), T - 1, dtype=jnp.int32),
    }


def test_nvs_head_trains_through_perceptual_loss():
    model = _model()
    batch = _batch()
    loss = Loss(
        [
            LossTerm(),  # default smooth_l1 heatmap term
            LossTerm(
                type="PerceptualLoss", weight=(0.05, 0.0),
                pred_key="nvs_rgb", gt_key="nvs_rgb_gt", mask_key="",
            ),
        ]
    )
    assert not loss.query_frame_only  # perceptual term forces the full path
    state, tx = create_train_state(
        model, OptimConfig(lr=3e-3, use_warmup=False, scheduler="constant"),
        jax.random.PRNGKey(0), batch,
    )
    # The NVS head exists in the tree (created whenever nvs_supervision).
    assert "rgb_proj" in state.params["params"]["decoder"]

    step = make_train_step(model, loss, tx, deterministic=True)
    rng = jax.random.PRNGKey(1)
    nvs_losses, totals = [], []
    for _ in range(30):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        totals.append(float(m["loss"]))
        nvs_losses.append(float(m["loss/nvs_rgb"]))
    # Both the heatmap term and the NVS perceptual term must go down —
    # gradients flow from VGG features through rgb_proj into the decoder.
    assert np.mean(nvs_losses[-3:]) < nvs_losses[0] * 0.8, nvs_losses[:3]
    assert np.mean(totals[-3:]) < totals[0], (totals[0], totals[-3:])


def test_nvs_rgb_approaches_query_image():
    """Direct pixel supervision sanity: with an L1 term on nvs_rgb the
    decoded image converges toward the query crop."""
    model = _model()
    batch = _batch()
    loss = Loss(
        [
            LossTerm(),
            LossTerm(
                type="l1", weight=(1.0, 0.0), pred_key="nvs_rgb",
                gt_key="nvs_rgb_gt", mask_key="",
            ),
        ]
    )
    state, tx = create_train_state(
        model, OptimConfig(lr=1e-2, use_warmup=False, scheduler="constant"),
        jax.random.PRNGKey(0), batch,
    )
    step = make_train_step(model, loss, tx, deterministic=True)

    def nvs_err(params):
        _, aux = model.apply(
            params, batch["images"], batch["bbox_feat"],
            jax.nn.one_hot(batch["query_idx"], 3, dtype=jnp.bool_),
            return_aux=True,
        )
        gt = batch["images"][:, -1]
        return float(jnp.abs(aux["nvs_rgb"] - gt).mean())

    before = nvs_err(state.params)
    rng = jax.random.PRNGKey(1)
    for _ in range(40):
        rng, sub = jax.random.split(rng)
        state, _ = step(state, batch, sub)
    after = nvs_err(state.params)
    assert after < before * 0.5, (before, after)


def test_evaluator_image_metric_branch(tmp_path):
    """NVS model + 'image' metrics_list: the Evaluator scores PSNR of the
    decoded query image (reference rgb_metrics -> psnr_{id} keys)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "data")
    )
    from fixture import make_linemod_fixture

    from boxdreamer_tpu.data import DatasetConfig, build_dataset
    from boxdreamer_tpu.training.evaluator import Evaluator
    from boxdreamer_tpu.training.metrics import MetricsConfig

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=4, n_test=2)
    ds = build_dataset(
        "LINEMOD", DatasetConfig(image_size=S, length=3), "test", root=root
    )
    model = _model()  # nvs_supervision=True
    b0 = ds[0]
    mask = jax.nn.one_hot(jnp.asarray([2]), 3, dtype=jnp.bool_)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["images"])[None],
        jnp.asarray(b0["bbox_feat"])[None],
        mask,
    )
    ev = Evaluator(
        model, params, batch_size=2, num_workers=0,
        metrics_config=MetricsConfig(
            metrics_list=("pose_error", "ADD", "proj2d", "image")
        ),
    )
    agg = ev.run_dataset(ds).aggregate()
    assert "psnr_0" in agg and "all" in agg["psnr_0"]
    assert np.isfinite(agg["psnr_0"]["all"])

import os

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx
from boxdreamer_tpu.training.callbacks import (
    NetworkMonitor,
    capture_feature_maps,
    feature_map_grid,
)

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


def setup():
    model = BoxDreamer(TINY)
    images = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 3, 28, 28))
    bbox_feat = jnp.zeros((1, 2, 8, 28, 28))
    mask = camera_mask_from_query_idx(jnp.array([1]), 2)
    params = model.init(jax.random.PRNGKey(1), images, bbox_feat, mask)
    return model, params, (images, bbox_feat, mask)


def test_capture_feature_maps():
    model, params, inputs = setup()
    feats = capture_feature_maps(model, params, inputs)
    assert len(feats) > 0
    assert any("attn" in k for k in feats)


def test_feature_map_grid_shapes():
    grid = feature_map_grid(np.random.default_rng(0).normal(size=(1, 4, 32)))
    assert grid.dtype == np.uint8 and grid.ndim == 2
    grid = feature_map_grid(np.random.default_rng(0).normal(size=(1, 8, 6, 6)))
    assert grid.shape[0] >= 6


def test_network_monitor_dumps(tmp_path):
    model, params, inputs = setup()
    mon = NetworkMonitor(model, str(tmp_path), every_n_steps=2, enabled=True)
    mon.maybe_dump(params, inputs, step=1)  # not on interval
    assert not os.listdir(tmp_path)
    mon.maybe_dump(params, inputs, step=2)
    assert len(os.listdir(tmp_path)) > 0


def test_network_monitor_disabled(tmp_path):
    model, params, inputs = setup()
    mon = NetworkMonitor(model, str(tmp_path), every_n_steps=1, enabled=False)
    mon.maybe_dump(params, inputs, step=1)
    assert not os.listdir(tmp_path)


def test_check_env_runs():
    from boxdreamer_tpu.tools.check_env import main

    assert main() == 0

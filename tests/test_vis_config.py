"""Config-driven visualization group (reference configs/model/vis/
default.yaml:1-3 consumed at src/lightning/utils/vis/vis_utils.py:53-169):
vis_types selects the rendered panel set, save_n_batches bounds the
contributing batches, and the group composes through the config system.
"""

import numpy as np

from boxdreamer_tpu.utils.vis import VisConfig, VisUtils


def _sample(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    K = np.array([[64.0, 0, 16], [0, 64.0, 16], [0, 0, 1]])
    pose = np.eye(4)
    pose[2, 3] = 4.0
    pose_pred = pose.copy()
    pose_pred[0, 3] = 0.1
    bbox_3d = (
        np.array(
            [[x, y, z] for z in (-1, 1) for y in (-1, 1) for x in (-1, 1)],
            dtype=np.float64,
        )
        * 0.3
    )
    hm = rng.uniform(-1, 1, size=(8, 32, 32)).astype(np.float32)
    return dict(
        image=img, K=K, pose_pred=pose_pred, pose_gt=pose, bbox_3d=bbox_3d,
        heatmaps=hm, gt_heatmaps=hm[::-1].copy(),
    )


def test_vis_types_select_panel_set():
    """Non-default vis_types change the rendered panel set: more types ->
    more columns (wider strip); empty selection -> no panel at all."""
    widths = {}
    for types in (("bbox",), ("bbox", "bbox_feat"),
                  ("bbox", "bbox_feat", "reprojection")):
        vis = VisUtils(max_samples=4, config=VisConfig(vis_types=types))
        vis.add_data(**_sample())
        panel = vis.render()
        assert panel is not None
        widths[types] = panel.width
    assert (
        widths[("bbox",)]
        < widths[("bbox", "bbox_feat")]
        < widths[("bbox", "bbox_feat", "reprojection")]
    )

    empty = VisUtils(max_samples=4, config=VisConfig(vis_types=()))
    empty.add_data(**_sample())
    assert empty.render() is None

    # Unknown types are ignored (reference behaviour: unlisted keys simply
    # never match the membership checks).
    vis = VisUtils(max_samples=4, config=VisConfig(vis_types=("bbox", "warp9")))
    vis.add_data(**_sample())
    assert vis.render().width == widths[("bbox",)]


def test_scene_type_appends_frustum_panel():
    vis = VisUtils(max_samples=4, config=VisConfig(vis_types=("bbox",)))
    vis.add_data(**_sample())
    w_bbox = vis.render().width
    vis = VisUtils(max_samples=4, config=VisConfig(vis_types=("bbox", "scene")))
    vis.add_data(**_sample())
    assert vis.render().width > w_bbox


def test_save_n_batches_budget():
    """Reference VisUtils.add_data budget (vis_utils.py:66-84): first batch
    of each NEW dataloader always contributes; beyond that only
    save_n_batches total batches do."""
    vis = VisUtils(max_samples=100, config=VisConfig(save_n_batches=2))
    for batch_i in range(5):
        for s in range(3):
            vis.add_data(**_sample(seed=batch_i * 3 + s), batch_id=(0, batch_i))
    assert len(vis.samples) == 6  # 2 batches x 3 samples of dataloader 0

    # A second dataloader's FIRST batch still contributes even though the
    # global batch budget is exhausted (multi-dataset eval shows every set).
    vis.add_data(**_sample(seed=99), batch_id=(1, 0))
    assert len(vis.samples) == 7
    vis.add_data(**_sample(seed=100), batch_id=(1, 1))  # budget applies again
    assert len(vis.samples) == 7

    vis.reset()
    assert not vis.samples and not vis.batches_seen


def test_vis_group_composes_from_config():
    """configs/model/vis/default.yaml rides the model defaults list and
    dotted overrides reach VisConfig.from_cfg."""
    from boxdreamer_tpu.utils.config import load_config

    cfg = load_config("configs", "test.yaml")
    vc = VisConfig.from_cfg(cfg.model.get("vis"))
    assert vc.save_n_batches == 1
    assert vc.use_mask is True
    assert vc.vis_types == ("bbox", "bbox_feat")

    cfg2 = load_config(
        "configs", "test.yaml",
        overrides=["model.vis.save_n_batches=3"],
    )
    vc2 = VisConfig.from_cfg(cfg2.model.get("vis"))
    assert vc2.save_n_batches == 3


def test_evaluator_honors_vis_config(tmp_path):
    """Evaluator wires VisConfig through: a non-default vis_types changes
    the rendered qualitative panel (e2e, tiny model on the LINEMOD
    fixture)."""
    import os
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from fixture import make_linemod_fixture
    from boxdreamer_tpu.data.registry import build_dataset
    from boxdreamer_tpu.data.base import DatasetConfig
    from boxdreamer_tpu.models import (
        BETRConfig, BoxDreamer, BoxDreamerConfig, DinoViTConfig,
    )
    from boxdreamer_tpu.training.evaluator import Evaluator

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=4, n_test=2)
    size = 28
    ds = build_dataset(
        "LINEMOD", DatasetConfig(image_size=size, length=3), "test", root=root
    )
    model = BoxDreamer(
        BoxDreamerConfig(
            betr=BETRConfig(
                d_model=32, nhead=2, num_decoder_layers=1, patch_size=14,
                img_size=size, dtype="float32",
            ),
            dino=DinoViTConfig(
                img_size=size, patch_size=14, embed_dim=32, depth=1,
                num_heads=2, dtype="float32",
            ),
            pnp_iters=3,
        )
    )
    b0 = ds[0]
    mask = jnp.zeros((1, 3), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["images"])[None],
        jnp.asarray(b0["bbox_feat"])[None],
        mask,
    )
    widths = {}
    for types in (("bbox",), ("bbox", "bbox_feat")):
        ev = Evaluator(
            model, params, batch_size=2, num_workers=0,
            vis_config=VisConfig(vis_types=types),
        )
        ev.run_dataset(ds)
        panel = ev.vis.render()
        assert panel is not None
        widths[types] = panel.width
    assert widths[("bbox",)] < widths[("bbox", "bbox_feat")]

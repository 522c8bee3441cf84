"""Mesh-sharded evaluation + BETR remat tests."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.parallel import mesh as mesh_lib
from boxdreamer_tpu.training.evaluator import Evaluator

TINY = BoxDreamerConfig(
    betr=BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    ),
    dino=DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
        dtype="float32",
    ),
    pnp_iters=3,
)


def test_mesh_sharded_eval_matches_single_device(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=6, n_test=4)
    ds = build_dataset(
        "LINEMOD", DatasetConfig(image_size=28, length=3), "test", root=root
    )
    model = BoxDreamer(TINY)
    b0 = ds[0]
    mask = jnp.zeros((1, 3), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["images"])[None],
        jnp.asarray(b0["bbox_feat"])[None],
        mask,
    )

    agg1 = Evaluator(model, params, batch_size=4, num_workers=0).run(
        [ds], output_json=None
    )
    mesh = mesh_lib.make_mesh(data=4, model=2)
    agg2 = Evaluator(
        model, params, batch_size=4, num_workers=0, mesh=mesh
    ).run([ds], output_json=None)
    np.testing.assert_allclose(
        agg1["avg_err_R_0"]["all"], agg2["avg_err_R_0"]["all"], rtol=0.05
    )
    np.testing.assert_allclose(
        agg1["avg_err_t_0"]["all"], agg2["avg_err_t_0"]["all"], rtol=0.05
    )


def test_betr_remat_matches_plain():
    import dataclasses

    cfg = TINY.betr
    cfg_remat = dataclasses.replace(cfg, remat=True)
    from boxdreamer_tpu.models import BETR

    B, T = 1, 2
    pose_feat = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 8, 28, 28))
    tokens = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4, 32))
    masks = jnp.zeros((B, T), dtype=bool).at[:, 1].set(True)

    m1, m2 = BETR(cfg), BETR(cfg_remat)
    params = m1.init(jax.random.PRNGKey(2), pose_feat, None, masks, tokens)
    out1 = m1.apply(params, pose_feat, None, masks, tokens)
    out2 = m2.apply(params, pose_feat, None, masks, tokens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # Gradients flow and match through the rematerialized stack.
    def loss(mod):
        return lambda p: (mod.apply(p, pose_feat, None, masks, tokens) ** 2).mean()

    g1 = jax.grad(loss(m1))(params)
    g2 = jax.grad(loss(m2))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

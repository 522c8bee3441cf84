import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.models import (
    BETR,
    BETRConfig,
    BoxDreamer,
    BoxDreamerConfig,
    DinoViT,
    DinoViTConfig,
)
from boxdreamer_tpu.models.boxdreamer import (
    camera_mask_from_query_idx,
    forward_with_pose,
)

# Tiny configs so CPU tests stay fast.
TINY_DINO = DinoViTConfig(
    img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2, dtype="float32"
)
TINY_BETR = BETRConfig(
    d_model=32, nhead=2, num_decoder_layers=2, patch_size=14, img_size=28,
    dtype="float32",
)
TINY_MODEL = BoxDreamerConfig(
    betr=TINY_BETR, dino=TINY_DINO, pnp_iters=5
)


def test_dino_output_shape():
    model = DinoViT(TINY_DINO)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 28, 28))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 32)  # 2x2 patches, embed 32
    assert np.isfinite(np.asarray(out)).all()


def test_betr_output_shape_and_range():
    model = BETR(TINY_BETR)
    B, T = 2, 3
    pose_feat = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 8, 28, 28))
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 3, 28, 28))
    tokens = jax.random.normal(jax.random.PRNGKey(2), (B, T, 4, 32))
    masks = camera_mask_from_query_idx(jnp.array([2, 0]), T)
    params = model.init(jax.random.PRNGKey(3), pose_feat, rgbs, masks, tokens)
    out = model.apply(params, pose_feat, rgbs, masks, tokens)
    assert out.shape == (B, 8, 28, 28)
    o = np.asarray(out)
    assert o.min() >= -1.0 and o.max() <= 1.0  # sigmoid squash


def test_betr_query_invariance():
    """The prediction must not depend on the content of the query frame's
    bbox features (they're replaced by the learnable query)."""
    model = BETR(TINY_BETR)
    B, T = 1, 3
    pose_feat = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 8, 28, 28))
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 3, 28, 28))
    tokens = jax.random.normal(jax.random.PRNGKey(2), (B, T, 4, 32))
    masks = camera_mask_from_query_idx(jnp.array([1]), T)
    params = model.init(jax.random.PRNGKey(3), pose_feat, rgbs, masks, tokens)
    out1 = model.apply(params, pose_feat, rgbs, masks, tokens)
    pose_feat2 = pose_feat.at[:, 1].set(jax.random.uniform(jax.random.PRNGKey(9), (B, 8, 28, 28)))
    out2 = model.apply(params, pose_feat2, rgbs, masks, tokens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_betr_from_scratch_path():
    cfg = dataclasses.replace(TINY_BETR, use_pretrained=False)
    model = BETR(cfg)
    B, T = 1, 2
    pose_feat = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 8, 28, 28))
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 3, 28, 28))
    masks = camera_mask_from_query_idx(jnp.array([1]), T)
    params = model.init(jax.random.PRNGKey(3), pose_feat, rgbs, masks, None)
    out = model.apply(params, pose_feat, rgbs, masks, None)
    assert out.shape == (B, 8, 28, 28)


def test_boxdreamer_forward_and_pose():
    model = BoxDreamer(TINY_MODEL)
    B, T = 2, 3
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (B, T, 3, 28, 28))
    bbox_feat = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 28, 28))
    query_idx = jnp.array([1, 2])
    camera_mask = camera_mask_from_query_idx(query_idx, T)
    params = model.init(jax.random.PRNGKey(2), images, bbox_feat, camera_mask)

    batch = {
        "images": images,
        "bbox_feat": bbox_feat,
        "query_idx": query_idx,
        "bbox_3d": jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(3), (8, 3)) * 0.1, (B, T, 8, 3)
        ),
        "non_ndc_intrinsics": jnp.broadcast_to(
            jnp.array([[100.0, 0, 14.0], [0, 100.0, 14.0], [0, 0, 1.0]]), (B, T, 3, 3)
        ),
    }
    out = jax.jit(lambda p, b: forward_with_pose(model, p, b))(params, batch)
    assert out["pred_bbox"].shape == (B, 8, 28, 28)
    assert out["pred_kpts_2d"].shape == (B, 8, 2)
    assert out["pred_poses"].shape == (B, 4, 4)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()
    # Bottom row of each pose is [0, 0, 0, 1].
    np.testing.assert_allclose(
        np.asarray(out["pred_poses"][:, 3]), np.tile([0, 0, 0, 1.0], (B, 1)), atol=1e-6
    )


def test_frozen_encoder_gets_zero_grads():
    model = BoxDreamer(TINY_MODEL)
    B, T = 1, 2
    images = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 3, 28, 28))
    bbox_feat = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 28, 28))
    camera_mask = camera_mask_from_query_idx(jnp.array([1]), T)
    params = model.init(jax.random.PRNGKey(2), images, bbox_feat, camera_mask)

    def loss(p):
        out = model.apply(p, images, bbox_feat, camera_mask)
        return (out**2).mean()

    g = jax.grad(loss)(params)
    enc = g["params"]["encoder"]
    assert all(
        np.abs(np.asarray(l)).max() == 0.0 for l in jax.tree_util.tree_leaves(enc)
    )
    dec = g["params"]["decoder"]
    assert any(
        np.abs(np.asarray(l)).max() > 0.0 for l in jax.tree_util.tree_leaves(dec)
    )


def test_voting_representation_end_to_end():
    """bbox_representation='voting': 16-channel head, vote-mean decode, PnP."""
    cfg = BoxDreamerConfig(
        bbox_representation="voting",
        betr=dataclasses.replace(TINY_BETR),
        dino=TINY_DINO,
        pnp_iters=3,
    )
    assert cfg.betr.box_dim == 16
    model = BoxDreamer(cfg)
    B, T = 1, 3
    images = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 3, 28, 28))
    bbox_feat = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 16, 28, 28))
    query_idx = jnp.array([T - 1])
    camera_mask = camera_mask_from_query_idx(query_idx, T)
    params = model.init(jax.random.PRNGKey(2), images, bbox_feat, camera_mask)
    batch = {
        "images": images,
        "bbox_feat": bbox_feat,
        "query_idx": query_idx,
        "bbox_3d": jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(3), (8, 3)) * 0.1, (B, T, 8, 3)
        ),
        "non_ndc_intrinsics": jnp.broadcast_to(
            jnp.array([[100.0, 0, 14.0], [0, 100.0, 14.0], [0, 0, 1.0]]),
            (B, T, 3, 3),
        ),
    }
    out = forward_with_pose(model, params, batch)
    assert out["pred_bbox"].shape == (B, 16, 28, 28)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()

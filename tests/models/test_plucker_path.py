import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.models.boxdreamer import (
    camera_mask_from_query_idx,
    forward_with_pose_rays,
)
from boxdreamer_tpu.ops import rotation as rot_ops

TINY = BoxDreamerConfig(
    pose_representation="plucker",
    betr=BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    ),
    dino=DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
        dtype="float32",
    ),
)


def test_betr_config_plucker_box_dim():
    assert TINY.betr.pose_representation == "plucker"
    assert TINY.betr.box_dim == 6


def make_batch(key, B=2, T=3):
    ks = jax.random.split(key, 3)
    R = rot_ops.rodrigues(jax.random.normal(ks[1], (B, T, 3)) * 0.3)
    poses = jnp.broadcast_to(jnp.eye(4), (B, T, 4, 4))
    poses = poses.at[..., :3, :3].set(R).at[..., :3, 3].set(
        jnp.array([0.0, 0.0, 1.0])
    )
    return {
        "images": jax.random.uniform(ks[0], (B, T, 3, 28, 28)),
        "poses": poses,
        "query_idx": jnp.array([T - 1] * B),
        "non_ndc_intrinsics": jnp.broadcast_to(
            jnp.array([[60.0, 0, 14.0], [0, 60.0, 14.0], [0, 0, 1.0]]), (B, T, 3, 3)
        ),
    }


def test_plucker_forward_and_pose_recovery():
    model = BoxDreamer(TINY)
    batch = make_batch(jax.random.PRNGKey(0))
    B, T = 2, 3
    camera_mask = camera_mask_from_query_idx(batch["query_idx"], T)
    rays = jax.random.normal(jax.random.PRNGKey(1), (B, T, 6, 2, 2))
    params = model.init(jax.random.PRNGKey(2), batch["images"], rays, camera_mask)

    out = jax.jit(lambda p, b: forward_with_pose_rays(model, p, b))(params, batch)
    assert out["pred_camera_rays"].shape == (B, 6, 2, 2)
    assert out["pred_poses"].shape == (B, 4, 4)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()
    # Rotations are valid.
    R = np.asarray(out["pred_poses"][:, :3, :3])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (B, 1, 1)), atol=1e-4
    )

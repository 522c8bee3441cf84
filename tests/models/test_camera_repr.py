import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models import camera_repr as CR
from boxdreamer_tpu.ops import rotation as rot_ops


def make_poses(key, B=2, T=3):
    ks = jax.random.split(key, 2)
    R = rot_ops.rodrigues(jax.random.normal(ks[0], (B, T, 3)) * 0.3)
    t = jnp.concatenate(
        [jax.random.normal(ks[1], (B, T, 2)) * 0.1, jnp.full((B, T, 1), 1.0)], axis=-1
    )
    poses = jnp.broadcast_to(jnp.eye(4), (B, T, 4, 4))
    return poses.at[..., :3, :3].set(R).at[..., :3, 3].set(t)


K224 = jnp.array([[600.0, 0, 112.0], [0, 600.0, 112.0], [0, 0, 1.0]])


def test_make_and_recover_rays_roundtrip():
    poses = make_poses(jax.random.PRNGKey(0))
    K = jnp.broadcast_to(K224, poses.shape[:2] + (3, 3))
    rays = CR.make_camera_rays(poses, K, image_size=224, patch_size=14)
    assert rays.shape == (2, 3, 6, 16, 16)
    rec = CR.recover_pose_from_rays(rays, K, image_size=224)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(poses), atol=1e-3)


def test_recover_first_camera_mode():
    poses = make_poses(jax.random.PRNGKey(1))
    K = jnp.broadcast_to(K224, poses.shape[:2] + (3, 3))
    rays = CR.make_camera_rays(poses, K, image_size=224, patch_size=14)
    rec = CR.recover_pose_from_rays(rays, K, image_size=224, coordinate="first_camera")
    np.testing.assert_allclose(np.asarray(rec[:, 0]), np.tile(np.eye(4), (2, 1, 1)), atol=1e-3)


def test_encode_camera_vector_quat():
    poses = make_poses(jax.random.PRNGKey(2))
    K = jnp.broadcast_to(K224, poses.shape[:2] + (3, 3))
    vec = CR.encode_camera_as_vector(poses, K, "quat", use_pp=True)
    assert vec.shape == (2, 3, CR.camera_vector_dim("quat", True))
    # Rotation part decodes back.
    R = rot_ops.quat_to_matrix(vec[..., :4])
    np.testing.assert_allclose(np.asarray(R), np.asarray(poses[..., :3, :3]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec[..., 4:7]), np.asarray(poses[..., :3, 3]))
    np.testing.assert_allclose(np.asarray(vec[..., 7]), 600.0)
    np.testing.assert_allclose(np.asarray(vec[..., 8:]), 112.0)


def test_encode_camera_vector_6d():
    poses = make_poses(jax.random.PRNGKey(3))
    K = jnp.broadcast_to(K224, poses.shape[:2] + (3, 3))
    vec = CR.encode_camera_as_vector(poses, K, "6d", use_pp=False)
    assert vec.shape == (2, 3, 10)
    R = rot_ops.sixd_to_matrix(vec[..., :6])
    np.testing.assert_allclose(np.asarray(R), np.asarray(poses[..., :3, :3]), atol=1e-5)


def test_safe_inverse():
    poses = make_poses(jax.random.PRNGKey(4))
    inv = CR.safe_inverse(poses)
    prod = jnp.einsum("btij,btjk->btik", poses, inv)
    np.testing.assert_allclose(
        np.asarray(prod), np.tile(np.eye(4), (2, 3, 1, 1)), atol=1e-5
    )

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.ops import camera, normalize, rotation


def random_poses(key, T=6):
    keys = jax.random.split(key, T)
    poses = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        R = rotation.rodrigues(jax.random.normal(k1, (3,)) * 0.4)
        t = jnp.array([0.0, 0.0, 1.5]) + jax.random.normal(k2, (3,)) * 0.2
        poses.append(jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t))
    return jnp.stack(poses)


def test_identity_when_all_flags_off():
    poses = random_poses(jax.random.PRNGKey(0))
    new_poses, _, scale, transform = normalize.normalize_cameras(poses, query_idx=0)
    np.testing.assert_allclose(new_poses, poses, atol=1e-6)
    np.testing.assert_allclose(scale, 1.0)
    np.testing.assert_allclose(transform, np.eye(4), atol=1e-6)


def test_first_camera_normalize_camera0_is_identity():
    poses = random_poses(jax.random.PRNGKey(1))
    new_poses, transform = normalize.first_camera_normalize(poses)
    np.testing.assert_allclose(new_poses[0], np.eye(4), atol=1e-5)
    np.testing.assert_allclose(transform, poses[0], atol=1e-6)


def test_first_camera_undo_identity():
    """denormalize_pose must recover the original pose exactly
    (the metric-time undo: pose @ coordinate_transform)."""
    poses = random_poses(jax.random.PRNGKey(2))
    new_poses, _, scale, transform = normalize.normalize_cameras(
        poses, query_idx=3, first_camera=True
    )
    restored = normalize.denormalize_pose(new_poses, scale, transform)
    np.testing.assert_allclose(restored, poses, atol=1e-5)


def test_first_camera_preserves_relative_pose():
    poses = random_poses(jax.random.PRNGKey(3))
    new_poses, _ = normalize.first_camera_normalize(poses)
    rel_before = camera.compose_poses(poses[2], camera.invert_pose(poses[1]))
    rel_after = camera.compose_poses(new_poses[2], camera.invert_pose(new_poses[1]))
    np.testing.assert_allclose(rel_after, rel_before, atol=1e-5)


def test_translation_scale_excludes_query_and_first():
    poses = random_poses(jax.random.PRNGKey(4))
    # Make the query translation huge — must not affect the scale.
    poses_huge = poses.at[3, :3, 3].multiply(1000.0)
    s1 = normalize.translation_scale(poses, query_idx=3, first_camera=True)
    s2 = normalize.translation_scale(poses_huge, query_idx=3, first_camera=True)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    # Same for camera 0 when first_camera=True.
    poses_huge0 = poses.at[0, :3, 3].multiply(1000.0)
    s3 = normalize.translation_scale(poses_huge0, query_idx=3, first_camera=True)
    np.testing.assert_allclose(s1, s3, atol=1e-6)


def test_translation_scale_formula():
    poses = random_poses(jax.random.PRNGKey(5))
    s = normalize.translation_scale(poses, query_idx=5, first_camera=False)
    t = np.asarray(poses[:, :3, 3])
    t_ref = t[np.arange(6) != 5]
    expected = np.linalg.norm(t_ref) / np.sqrt(len(t_ref)) / 2.0
    np.testing.assert_allclose(s, np.clip(expected, 0.01, 100.0), rtol=1e-5)


def test_translation_scale_max_norm():
    poses = random_poses(jax.random.PRNGKey(6))
    s = normalize.translation_scale(poses, query_idx=5, first_camera=False, max_norm=True)
    t = np.asarray(poses[:, :3, 3])
    expected = np.linalg.norm(t[np.arange(6) != 5], axis=-1).max()
    np.testing.assert_allclose(s, np.clip(expected, 0.01, 100.0), rtol=1e-5)


def test_normalize_trans_undo():
    poses = random_poses(jax.random.PRNGKey(7))
    new_poses, _, scale, transform = normalize.normalize_cameras(
        poses, query_idx=2, first_camera=True, normalize_trans=True
    )
    restored = normalize.denormalize_pose(new_poses, scale, transform)
    np.testing.assert_allclose(restored, poses, atol=1e-5)


def test_optical_normalize_unit_distance():
    """After optical normalization, camera 0 sits at unit distance from the
    origin (the optical-axis intersection)."""
    # Cameras looking at the origin from a ring.
    poses = []
    for ang in [0.0, 0.5, 1.0, 1.5]:
        R = rotation.rodrigues(jnp.array([0.0, ang, 0.0]))
        center = -jnp.einsum("ji,j->i", R, jnp.array([0.0, 0.0, 2.0]))  # look-at origin
        t = jnp.array([0.0, 0.0, 2.0])
        poses.append(jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t))
    poses = jnp.stack(poses)
    new_poses, _, scale, _ = normalize.normalize_cameras(
        poses, query_idx=1, compute_optical=True
    )
    R0 = new_poses[0, :3, :3]
    t0 = new_poses[0, :3, 3]
    center0 = -np.asarray(R0).T @ np.asarray(t0)
    np.testing.assert_allclose(np.linalg.norm(center0), 1.0, atol=1e-4)
    np.testing.assert_allclose(scale, 2.0, atol=1e-4)


def test_normalize_is_jittable():
    poses = random_poses(jax.random.PRNGKey(8))
    f = jax.jit(
        lambda p, q: normalize.normalize_cameras(
            p, q, first_camera=True, normalize_trans=True
        )
    )
    new_poses, _, scale, transform = f(poses, jnp.asarray(2))
    assert np.isfinite(np.asarray(new_poses)).all()
    assert np.isfinite(float(scale))

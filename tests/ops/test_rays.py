import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.ops import camera as camera_ops
from boxdreamer_tpu.ops import rays as rays_ops
from boxdreamer_tpu.ops import rotation as rot_ops


def make_cameras(key, B=3):
    ks = jax.random.split(key, 2)
    R = rot_ops.rodrigues(jax.random.normal(ks[0], (B, 3)) * 0.4)
    t = jnp.concatenate(
        [jax.random.normal(ks[1], (B, 2)) * 0.1, jnp.full((B, 1), 1.2)], axis=-1
    )
    poses = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    poses = poses.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    fl = jnp.tile(jnp.array([[3.2, 3.2]]), (B, 1))
    pp = jnp.tile(jnp.array([[0.05, -0.02]]), (B, 1))
    crop = jnp.tile(jnp.array([[0.1, -0.05, 1.5, 1.0]]), (B, 1))
    return poses, fl, pp, crop


def test_ndc_grid_full_image():
    g = rays_ops.compute_ndc_grid(None, 4, 4)
    assert g.shape == (16, 3)
    # Half-pixel grid spans +/-(1 - 1/4); top-left patch at (+,+).
    np.testing.assert_allclose(g[0], [0.75, 0.75, 1.0], atol=1e-6)
    np.testing.assert_allclose(g[-1], [-0.75, -0.75, 1.0], atol=1e-6)


def test_plucker_roundtrip():
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (5, 3))
    d = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    pl = rays_ops.to_plucker(o, d)
    o2, d2 = rays_ops.to_point_direction(pl)
    # Recovered origin is the closest point on the line to the world origin;
    # verify it lies on the original line and directions match.
    dn = np.asarray(d) / np.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(d2), dn, atol=1e-5)
    cross = np.cross(np.asarray(o2) - np.asarray(o), dn)
    np.testing.assert_allclose(cross, 0.0, atol=1e-5)


def test_spatial_roundtrip():
    pl = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 6))
    sp = rays_ops.rays_to_spatial(pl, 4)
    assert sp.shape == (2, 6, 4, 4)
    back = rays_ops.rays_from_spatial(sp)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pl), atol=0)


def test_rays_directions_through_center_pixel():
    """The ray of the central patch points along the camera's viewing axis
    when pp=0 and no crop."""
    poses = jnp.eye(4)[None]
    fl = jnp.array([[2.0, 2.0]])
    pp = jnp.array([[0.0, 0.0]])
    pl = rays_ops.cameras_to_rays(poses, fl, pp, None, 16, 16)
    origins, dirs = rays_ops.to_point_direction(pl)
    mean_dir = np.asarray(dirs).mean(axis=1)
    mean_dir /= np.linalg.norm(mean_dir)
    np.testing.assert_allclose(mean_dir[0], [0, 0, 1.0], atol=1e-3)


def test_cameras_to_rays_to_cameras_roundtrip():
    poses, fl, pp, crop = make_cameras(jax.random.PRNGKey(3))
    pl = rays_ops.cameras_to_rays(poses, fl, pp, crop)
    rec = rays_ops.rays_to_cameras(pl, crop, fl, pp)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(poses), atol=1e-4)


def test_roundtrip_without_crop():
    poses, fl, pp, _ = make_cameras(jax.random.PRNGKey(4))
    pl = rays_ops.cameras_to_rays(poses, fl, pp, None)
    rec = rays_ops.rays_to_cameras(pl, None, fl, pp)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(poses), atol=1e-4)


def test_procrustes_recovers_rotation():
    R = rot_ops.rodrigues(jnp.array([0.3, -0.2, 0.5]))
    B = jax.random.normal(jax.random.PRNGKey(5), (50, 3))
    A = B @ np.asarray(R).T
    est = rays_ops.procrustes_align(jnp.asarray(A), B)
    np.testing.assert_allclose(np.asarray(est), np.asarray(R), atol=1e-5)


def test_intersect_skew_lines():
    center = jnp.array([0.3, -0.2, 0.9])
    dirs = jax.random.normal(jax.random.PRNGKey(6), (20, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    offsets = jax.random.normal(jax.random.PRNGKey(7), (20, 1))
    origins = center + dirs * offsets
    rec = rays_ops.intersect_skew_lines(origins, dirs)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(center), atol=1e-5)


def test_homography_recovery_identity_intrinsics():
    """rays_to_cameras_homography on exact rays recovers pose and roughly
    unit focal when the generating camera has f=1, pp=0."""
    key = jax.random.PRNGKey(8)
    R = rot_ops.rodrigues(jax.random.normal(key, (2, 3)) * 0.2)
    poses = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    poses = poses.at[:, :3, :3].set(R).at[:, :3, 3].set(
        jnp.array([[0.1, 0.0, 1.0], [-0.1, 0.05, 1.1]])
    )
    fl = jnp.ones((2, 2))
    pp = jnp.zeros((2, 2))
    pl = rays_ops.cameras_to_rays(poses, fl, pp, None, 8, 8)
    rec, f, p = rays_ops.rays_to_cameras_homography(pl, None, 8, 8)
    np.testing.assert_allclose(np.asarray(rec[:, :3, :3]), np.asarray(poses[:, :3, :3]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rec[:, :3, 3]), np.asarray(poses[:, :3, 3]), atol=5e-3)
    np.testing.assert_allclose(np.abs(np.asarray(f)), 1.0, atol=0.05)


def test_ransac_homography_with_outliers():
    key = jax.random.PRNGKey(9)
    H_true = jnp.array([[1.1, 0.05, 0.02], [-0.03, 0.95, -0.01], [0.01, 0.02, 1.0]])
    src = jax.random.uniform(key, (40, 2), minval=-1, maxval=1)
    homog = jnp.concatenate([src, jnp.ones((40, 1))], axis=-1) @ H_true.T
    dst = homog[:, :2] / homog[:, 2:]
    dst_bad = np.asarray(dst).copy()
    dst_bad[:8] += 3.0  # outliers
    H_est = rays_ops.ransac_homography(
        src, jnp.asarray(dst_bad), threshold=0.05, num_hypotheses=64
    )
    H_est = np.asarray(H_est)
    H_est = H_est / H_est[2, 2] * float(H_true[2, 2])
    np.testing.assert_allclose(H_est, np.asarray(H_true), atol=5e-3)

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.ops import camera, pnp, rotation


def unit_cube_corners():
    bits = np.array(
        [
            [0, 0, 0],
            [0, 1, 0],
            [1, 1, 0],
            [1, 0, 0],
            [0, 0, 1],
            [0, 1, 1],
            [1, 1, 1],
            [1, 0, 1],
        ],
        dtype=np.float32,
    )
    return jnp.asarray((bits - 0.5) * 0.2)  # 20cm cube centered at origin


def random_pose(key, depth=0.6):
    k1, k2 = jax.random.split(key)
    rvec = jax.random.normal(k1, (3,)) * 0.5
    R = rotation.rodrigues(rvec)
    t = jnp.array([0.02, -0.03, depth]) + jax.random.normal(k2, (3,)) * 0.02
    pose = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return pose


K_DEFAULT = jnp.array([[572.4, 0.0, 112.0], [0.0, 573.6, 112.0], [0.0, 0.0, 1.0]])


def rot_err_deg(Ra, Rb):
    tr = np.clip(np.trace(np.asarray(Ra).T @ np.asarray(Rb)), -1.0, 3.0)
    return np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))


def test_pnp_exact_recovery_single():
    pts3d = unit_cube_corners()
    pose = random_pose(jax.random.PRNGKey(0))
    uv = camera.project_points(pts3d[None], K_DEFAULT[None], pose[None])[0]
    est = pnp.solve_pnp(pts3d, uv, K_DEFAULT)
    assert rot_err_deg(est[:3, :3], pose[:3, :3]) < 0.05
    assert np.linalg.norm(np.asarray(est[:3, 3] - pose[:3, 3])) < 1e-3


def test_pnp_batched_recovery():
    pts3d = unit_cube_corners()
    keys = jax.random.split(jax.random.PRNGKey(1), 12)
    poses = jnp.stack([random_pose(k) for k in keys])  # (12, 4, 4)
    poses = poses.reshape(3, 4, 4, 4)  # leading dims (B=3, T=4)
    pts = jnp.broadcast_to(pts3d, (3, 4, 8, 3))
    Ks = jnp.broadcast_to(K_DEFAULT, (3, 4, 3, 3))
    uv = camera.project_points(pts, Ks, poses)
    est = pnp.solve_pnp(pts, uv, Ks)
    assert est.shape == (3, 4, 4, 4)
    for b in range(3):
        for t in range(4):
            assert rot_err_deg(est[b, t, :3, :3], poses[b, t, :3, :3]) < 0.05
            assert np.linalg.norm(np.asarray(est[b, t, :3, 3] - poses[b, t, :3, 3])) < 1e-3


def test_pnp_noisy_observations():
    pts3d = unit_cube_corners()
    pose = random_pose(jax.random.PRNGKey(2))
    uv = camera.project_points(pts3d[None], K_DEFAULT[None], pose[None])[0]
    noise = jax.random.normal(jax.random.PRNGKey(3), uv.shape) * 1.0  # 1px
    est = pnp.solve_pnp(pts3d, uv + noise, K_DEFAULT)
    assert rot_err_deg(est[:3, :3], pose[:3, :3]) < 3.0
    assert np.linalg.norm(np.asarray(est[:3, 3] - pose[:3, 3])) < 0.02


def test_pnp_is_jittable_and_finite_on_degenerate_input():
    pts3d = unit_cube_corners()
    uv = jnp.zeros((8, 2))  # all observations identical — degenerate
    est = pnp.solve_pnp(pts3d, uv, K_DEFAULT)
    assert np.isfinite(np.asarray(est)).all()


def test_pnp_ransac_rejects_outliers():
    pts3d = jnp.asarray(
        np.random.default_rng(0).uniform(-0.1, 0.1, size=(24, 3)).astype(np.float32)
    )
    pose = random_pose(jax.random.PRNGKey(4))
    uv = camera.project_points(pts3d[None], K_DEFAULT[None], pose[None])[0]
    # Corrupt 6 of 24 points badly.
    uv_bad = np.asarray(uv).copy()
    uv_bad[:6] += np.array([80.0, -60.0])
    est = pnp.solve_pnp_ransac(
        pts3d, jnp.asarray(uv_bad), K_DEFAULT, threshold=2.0, num_hypotheses=64
    )
    assert rot_err_deg(est[:3, :3], pose[:3, :3]) < 0.5
    assert np.linalg.norm(np.asarray(est[:3, 3] - pose[:3, 3])) < 5e-3


def test_pnp_matches_cv2_when_available():
    cv2 = None
    try:
        import cv2  # noqa: F401
    except Exception:
        pass
    if cv2 is None:
        import pytest

        pytest.skip("cv2 not installed in this environment")
    pts3d = unit_cube_corners()
    pose = random_pose(jax.random.PRNGKey(5))
    uv = camera.project_points(pts3d[None], K_DEFAULT[None], pose[None])[0]
    noise = jax.random.normal(jax.random.PRNGKey(6), uv.shape) * 2.0
    uv_noisy = np.asarray(uv + noise, dtype=np.float32)
    ok, rvec, tvec = cv2.solvePnP(
        np.asarray(pts3d), uv_noisy, np.asarray(K_DEFAULT), None,
        flags=cv2.SOLVEPNP_ITERATIVE,
    )
    R_cv, _ = cv2.Rodrigues(rvec)
    est = pnp.solve_pnp(pts3d, jnp.asarray(uv_noisy), K_DEFAULT)
    assert rot_err_deg(est[:3, :3], R_cv) < 0.2
    assert np.linalg.norm(np.asarray(est[:3, 3]) - tvec.ravel()) < 2e-3

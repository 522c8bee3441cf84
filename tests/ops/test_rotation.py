import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.ops import rotation


def random_rotations(key, n):
    """Uniform-ish random rotation matrices via QR."""
    m = jax.random.normal(key, (n, 3, 3))
    q, r = jnp.linalg.qr(m)
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = jnp.linalg.det(q)
    q = q.at[:, :, 0].multiply(det[:, None])
    return q


def test_rodrigues_identity():
    R = rotation.rodrigues(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_rodrigues_quarter_turn_z():
    rvec = jnp.array([0.0, 0.0, jnp.pi / 2])
    R = rotation.rodrigues(rvec)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rodrigues_roundtrip():
    # Keep theta < pi: axis-angle is only unique inside the open ball.
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    axes = jax.random.normal(k1, (64, 3))
    axes = axes / jnp.linalg.norm(axes, axis=-1, keepdims=True)
    theta = jax.random.uniform(k2, (64, 1), minval=1e-3, maxval=3.0)
    rvecs = axes * theta
    R = rotation.rodrigues(rvecs)
    back = rotation.inverse_rodrigues(R)
    np.testing.assert_allclose(back, rvecs, atol=1e-4)


def test_inverse_rodrigues_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis = axis / np.linalg.norm(axis)
    theta = np.pi - 1e-6
    R = rotation.rodrigues(jnp.asarray(axis * theta))
    back = np.asarray(rotation.inverse_rodrigues(R))
    # Axis-angle near pi: sign may flip, compare rotations instead.
    R2 = rotation.rodrigues(jnp.asarray(back))
    np.testing.assert_allclose(R2, R, atol=1e-4)


def test_quat_matrix_roundtrip():
    key = jax.random.PRNGKey(1)
    Rs = random_rotations(key, 32)
    q = rotation.matrix_to_quat(Rs)
    back = rotation.quat_to_matrix(q)
    np.testing.assert_allclose(back, Rs, atol=1e-5)


def test_sixd_roundtrip():
    key = jax.random.PRNGKey(2)
    Rs = random_rotations(key, 16)
    sixd = rotation.matrix_to_sixd(Rs)
    back = rotation.sixd_to_matrix(sixd)
    np.testing.assert_allclose(back, Rs, atol=1e-5)


def test_orthogonalize_projects_to_so3():
    key = jax.random.PRNGKey(3)
    Rs = random_rotations(key, 8)
    noisy = Rs + 0.01 * jax.random.normal(jax.random.PRNGKey(4), Rs.shape)
    fixed = rotation.orthogonalize(noisy)
    eye = jnp.einsum("bij,bkj->bik", fixed, fixed)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.det(fixed), np.ones(8), atol=1e-5)


def test_hat_cross_product_equivalence():
    v = jnp.array([1.0, -2.0, 0.5])
    w = jnp.array([0.3, 0.7, -1.1])
    np.testing.assert_allclose(
        rotation.hat(v) @ w, jnp.cross(v, w), atol=1e-6
    )

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.training.perceptual import PerceptualLoss, psnr
from boxdreamer_tpu.training import regression3d as R3D


def test_perceptual_zero_for_identical():
    pl = PerceptualLoss(input_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 32))
    assert float(pl(x, x)) < 1e-10
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 32))
    assert float(pl(x, y)) > 0


def test_perceptual_is_differentiable():
    pl = PerceptualLoss(input_size=32)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 32))

    g = jax.grad(lambda x: pl(x, y))(jnp.full((1, 3, 32, 32), 0.5))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_psnr():
    x = jnp.zeros((4, 4))
    y = jnp.full((4, 4), 0.1)
    np.testing.assert_allclose(float(psnr(x, y)), 20.0, atol=1e-4)
    assert float(psnr(x, x)) > 100


def test_regr3d_zero_on_match():
    pts = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 3))
    valid = jnp.ones((1, 4, 4), bool)
    d = R3D.regr3d(pts, pts, valid)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_regr3d_scale_invariance():
    """With avg_dis normalization, a globally scaled prediction has zero
    loss."""
    pts = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
    valid = jnp.ones((1, 4, 4), bool)
    d = R3D.regr3d(pts * 3.0, pts, valid, norm_mode="avg_dis")
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)


def test_regr3d_masks_invalid():
    pts = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 3))
    other = pts + 1.0
    valid = jnp.zeros((1, 4, 4), bool).at[0, 0, 0].set(True)
    d = R3D.regr3d(pts, other, valid, norm_mode=None)
    assert float(d[0, 0, 0]) > 0
    np.testing.assert_allclose(np.asarray(d[0, 1:, :]), 0.0)


def test_conf_loss_prefers_confident_correct():
    loss_map = jnp.zeros((1, 4, 4))
    valid = jnp.ones((1, 4, 4), bool)
    high_conf = jnp.full((1, 4, 4), 3.0)
    low_conf = jnp.full((1, 4, 4), -3.0)
    # Zero error: higher confidence => lower loss (the -log conf bonus).
    assert float(R3D.conf_loss(loss_map, high_conf, valid)) < float(
        R3D.conf_loss(loss_map, low_conf, valid)
    )
    # Large error: high confidence is now penalized.
    big = jnp.full((1, 4, 4), 5.0)
    assert float(R3D.conf_loss(big, high_conf, valid)) > float(
        R3D.conf_loss(big, low_conf, valid)
    )


def test_scale_shift_invariant_variant():
    pts = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
    valid = jnp.ones((2, 4, 4), bool)
    transformed = pts * 2.5 + jnp.array([0.3, -0.2, 1.0])
    d = R3D.regr3d_scale_shift_inv(transformed, pts, valid)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-5)

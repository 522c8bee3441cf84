"""Prologue-fused matmul kernels (ops/fused_matmul.py), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.models.layers import gelu_bf16_fast
from boxdreamer_tpu.ops import fused_matmul as F

KS = jax.random.split(jax.random.PRNGKey(0), 8)
M, K, C = 200, 64, 96  # deliberately not multiples of the block sizes
X = jax.random.normal(KS[0], (M, K), jnp.float32)
H = jax.random.normal(KS[3], (M, K), jnp.float32)
W = jax.random.normal(KS[1], (K, C), jnp.float32) * 0.1
B = jax.random.normal(KS[2], (C,), jnp.float32)
GAMMA = jax.random.uniform(KS[4], (K,), jnp.float32, 0.5, 1.5)
BETA = jax.random.normal(KS[5], (K,), jnp.float32) * 0.1


def test_gelu_matmul_matches_reference():
    y = F.gelu_matmul(X, W, B, 128, True)
    ref = F.gelu_fast(X) @ W + B
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)
    y2 = F.gelu_matmul(X, W, None, 128, True)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(F.gelu_fast(X) @ W), atol=1e-4
    )


def test_gelu_prologue_matches_production_gelu():
    xb = X.astype(jnp.bfloat16)
    assert (
        float(
            jnp.abs(
                F.gelu_fast(xb).astype(jnp.float32)
                - gelu_bf16_fast(xb).astype(jnp.float32)
            ).max()
        )
        == 0.0
    )


def test_gelu_matmul_grads():
    g1 = jax.grad(
        lambda x, w, b: jnp.sum(jnp.sin(F.gelu_matmul(x, w, b, 128, True))),
        argnums=(0, 1, 2),
    )(X, W, B)
    g2 = jax.grad(
        lambda x, w, b: jnp.sum(jnp.sin(F.gelu_fast(x) @ w + b)),
        argnums=(0, 1, 2),
    )(X, W, B)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("residual,bias", [(True, True), (False, False),
                                           (True, False), (False, True)])
def test_ln_matmul_matches_reference(residual, bias):
    h = H if residual else None
    b = B if bias else None
    y, t = F.ln_matmul(X, h, W, GAMMA, BETA, b, 1e-5, 128, True)
    yr, tr = F._ln_ref(X, h, W, GAMMA, BETA, b, 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-4)
    if residual:
        np.testing.assert_allclose(np.asarray(t), np.asarray(tr), atol=0)
    else:
        assert t is X


def test_ln_matmul_grads_both_outputs():
    def loss_k(x, h, w, gamma, beta, b):
        y, t = F.ln_matmul(x, h, w, gamma, beta, b, 1e-5, 128, True)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.cos(t))

    def loss_r(x, h, w, gamma, beta, b):
        y, t = F._ln_ref(x, h, w, gamma, beta, b, 1e-5)
        return jnp.sum(jnp.sin(y)) + jnp.sum(jnp.cos(t))

    g1 = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(X, H, W, GAMMA, BETA, B)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(X, H, W, GAMMA, BETA, B)
    for a, b, name in zip(g1, g2, "x h w gamma beta bias".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
        )


def test_block_c_chooser_tiling_legal():
    """Column tiles must be LANE multiples dividing C (Mosaic requirement
    that broke the first on-chip compile at C=768/f32)."""
    for Kd, Cd, item in [(3072, 768, 4), (768, 3072, 4), (768, 3072, 2),
                         (64, 96, 4), (768, 768, 4)]:
        bc = F._pick_block_c(Kd, Cd, 256, item, n_row_bufs=3)
        assert Cd % bc == 0
        assert bc == Cd or bc % F.LANE == 0, (Kd, Cd, bc)

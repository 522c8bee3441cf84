"""int8 quantized matmul (ops/quant.py) and the quantized serving mode."""

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.ops import quant


def test_weight_quant_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.3
    wq, s = quant.quantize_weight_int8(w)
    assert wq.dtype == jnp.int8 and s.shape == (1, 32)
    back = wq.astype(jnp.float32) * s
    # Symmetric 8-bit: max error is half a quantization step per channel.
    err = np.abs(np.asarray(back - w))
    step = np.asarray(s)
    assert (err <= 0.5 * step + 1e-7).all()


def test_zero_channel_scale_is_safe():
    w = jnp.zeros((16, 4))
    wq, s = quant.quantize_weight_int8(w)
    assert np.all(np.asarray(s) == 1.0) and np.all(np.asarray(wq) == 0)
    x = jnp.ones((2, 16))
    y = quant.int8_matmul(x, w)
    assert np.all(np.asarray(y) == 0.0)


def test_int8_matmul_accuracy():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (128, 96))
    w = jax.random.normal(kw, (96, 64)) * 0.1
    b = jnp.linspace(-1, 1, 64)
    y = quant.int8_matmul(x, w, b, out_dtype=jnp.float32)
    ref = x @ w + b
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    # Per-row x per-channel dynamic int8: ~0.5% relative error at these
    # well-conditioned shapes.
    assert rel < 0.02, rel


def test_int8_matmul_leading_dims():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32))
    w = jax.random.normal(jax.random.PRNGKey(3), (32, 8))
    y = quant.int8_matmul(x, w)
    assert y.shape == (2, 3, 8) and y.dtype == jnp.bfloat16


def test_quantized_block_matches_float_and_shares_params():
    """TransformerBlock(quantize='int8') must (a) declare the SAME param
    tree as the float block (checkpoint compatibility), (b) produce
    serving outputs close to the float path, and (c) fall back to
    differentiable float math when deterministic=False."""
    from boxdreamer_tpu.models.layers import TransformerBlock

    B, N, C = 2, 64, 96
    x = jax.random.normal(jax.random.PRNGKey(4), (B, N, C)) * 0.5
    kw = dict(num_heads=4, qk_norm=True, ln_eps=1e-5, dtype=jnp.float32)
    float_blk = TransformerBlock(**kw)
    int8_blk = TransformerBlock(quantize="int8", **kw)

    params = float_blk.init(jax.random.PRNGKey(5), x)
    params_q = int8_blk.init(jax.random.PRNGKey(5), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_q
    )

    y_f = float_blk.apply(params, x, True)
    y_q = int8_blk.apply(params, x, True)
    cos = float(
        jnp.sum(y_f * y_q)
        / (jnp.linalg.norm(y_f) * jnp.linalg.norm(y_q))
    )
    assert cos > 0.999, cos
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.05, rel

    # Training fallback: float math, differentiable, no int8 anywhere.
    def loss(p):
        y = int8_blk.apply(
            p, x, False, rngs={"dropout": jax.random.PRNGKey(6)}
        )
        return jnp.sum(y**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_quantized_betr_forward_close_to_float():
    """Full BETR decoder in int8 serving mode: heatmap outputs must stay
    close to the float forward (same params)."""
    import dataclasses

    from boxdreamer_tpu.models.betr import BETR, BETRConfig

    cfg = BETRConfig(
        d_model=64, nhead=4, num_decoder_layers=2, patch_size=8,
        img_size=32, use_pretrained=False, dtype="float32",
    )
    cfg_q = dataclasses.replace(cfg, quantize="int8")
    B, T, S = 2, 3, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    bbox_feat = jax.random.uniform(ks[0], (B, T, 8, S, S)) * 2 - 1
    images = jax.random.uniform(ks[1], (B, T, 3, S, S))
    masks = jnp.zeros((B, T), bool).at[:, -1].set(True)

    model_f, model_q = BETR(cfg), BETR(cfg_q)
    params = model_f.init(ks[2], bbox_feat, images, masks)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        model_q.init(ks[2], bbox_feat, images, masks)
    )
    y_f = model_f.apply(params, bbox_feat, images, masks, deterministic=True)
    y_q = model_q.apply(params, bbox_feat, images, masks, deterministic=True)
    assert y_q.shape == y_f.shape
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.1, rel


def test_quantized_dinovit_close_to_float():
    """DinoViT with quantize='int8' (layerscale blocks): same param tree,
    output close to float."""
    import dataclasses

    from boxdreamer_tpu.models.dinov2 import DinoViT, DinoViTConfig

    cfg = DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        dtype="float32",
    )
    model_f = DinoViT(cfg)
    model_q = DinoViT(dataclasses.replace(cfg, quantize="int8"))
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 3, 28, 28))
    params = model_f.init(jax.random.PRNGKey(9), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        model_q.init(jax.random.PRNGKey(9), x)
    )
    y_f = model_f.apply(params, x)
    y_q = model_q.apply(params, x)
    rel = float(jnp.linalg.norm(y_q - y_f) / jnp.linalg.norm(y_f))
    assert rel < 0.1, rel


def test_fused_quantize_rows_matches_xla():
    """Pallas single-pass row quantize (kept opt-in after losing its A/B —
    see its docstring) must match the XLA twin to the tie-rounding LSB."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from boxdreamer_tpu.ops import quant

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((512, 256)), jnp.bfloat16
    )
    q0, s0 = quant.quantize_rows_int8(x)
    q1, s1 = quant.quantize_rows_int8_fused(x, block_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    d = np.abs(np.asarray(q0, np.int32) - np.asarray(q1, np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3  # .5-tie rounding only

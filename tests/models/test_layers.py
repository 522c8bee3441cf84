import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import torch

from boxdreamer_tpu.models import layers


def test_patchify_unpatchify_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 28, 28))
    tokens = layers.patchify(x, 14)
    assert tokens.shape == (2, 4, 14 * 14 * 8)
    back = layers.unpatchify(tokens, 14, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_patchify_matches_reference_layout():
    """Reference patchify (betr.py:211-228): reshape(B,c,h,p,w,q) ->
    einsum nchpwq->nhwpqc -> (B, h*w, p*p*c). Verify against torch."""
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    p, c = 14, 3
    t = torch.from_numpy(imgs)
    h = w = 28 // p
    ref = t.reshape(2, c, h, p, w, p)
    ref = torch.einsum("nchpwq->nhwpqc", ref).reshape(2, h * w, p * p * c)
    ours = layers.patchify(jnp.asarray(imgs), p)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_patchify_leading_dims():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 28, 28))
    tokens = layers.patchify(x, 14)
    assert tokens.shape == (2, 3, 4, 14 * 14 * 8)
    single = layers.patchify(x[0, 1], 14)
    np.testing.assert_allclose(np.asarray(tokens[0, 1]), np.asarray(single), atol=0)


def test_sincos_pos_embed_matches_reference():
    """Golden check against the reference formula
    (pos_encodiong.py:125-213) re-derived in numpy with torch ops."""
    d, g = 64, 4
    # Reference computation.
    grid_h = torch.arange(g, dtype=torch.float64)
    grid_w = torch.arange(g, dtype=torch.float64)
    gw, gh = torch.meshgrid(grid_w, grid_h, indexing="xy")
    grid = torch.stack([gw, gh], dim=0).reshape(2, 1, g, g)

    def emb_1d(dim, pos):
        omega = torch.arange(dim // 2, dtype=torch.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = torch.einsum("m,d->md", pos.reshape(-1), omega)
        return torch.cat([torch.sin(out), torch.cos(out)], dim=1)

    emb = torch.cat([emb_1d(d // 2, grid[0]), emb_1d(d // 2, grid[1])], dim=1)
    ref = emb.reshape(g, g, d).reshape(g * g, d).numpy()

    ours = layers.get_2d_sincos_pos_embed(d, g, g)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rmsnorm_matches_llama_semantics():
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16)) * 3.0
    mod = layers.RMSNorm()
    params = mod.init(jax.random.PRNGKey(3), x)
    out = mod.apply(params, x)
    xn = np.asarray(x)
    expected = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_transformer_block_shapes_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 64))
    block = layers.TransformerBlock(num_heads=4, qk_norm=True)
    params = block.init(jax.random.PRNGKey(5), x)
    out = block.apply(params, x)
    assert out.shape == x.shape

    def loss(p):
        return (block.apply(p, x) ** 2).mean()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_gelu_is_exact_variant():
    x = jnp.asarray([-1.0, 0.5, 2.0])
    ours = layers.gelu_exact(x)
    ref = torch.nn.functional.gelu(torch.tensor([-1.0, 0.5, 2.0]))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_fast_gelu_matches_exact_below_bf16_resolution():
    """The bf16 fast GELU's fitted max deviation from exact erf GELU is
    2.6e-5 absolute — ~150x below bf16 eps. Verify in f32 math over a dense
    range including the clamp boundary and far tails."""
    x = jnp.concatenate(
        [jnp.linspace(-30.0, 30.0, 200_001), jnp.linspace(-6.2, -5.8, 10_001)]
    )
    fast = layers.gelu_bf16_fast(x.astype(jnp.float32))
    exact = layers.gelu_exact(x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=3e-5)


def test_gelu_dispatch_by_dtype():
    x32 = jnp.linspace(-3.0, 3.0, 101, dtype=jnp.float32)
    # f32: exact path, bit-identical to gelu_exact.
    np.testing.assert_array_equal(
        np.asarray(layers.gelu(x32)), np.asarray(layers.gelu_exact(x32))
    )
    # bf16: fast path preserves dtype and stays within one bf16 ULP (2^-7
    # relative — 7 stored mantissa bits) of the exact computation.
    xb = x32.astype(jnp.bfloat16)
    fast = layers.gelu(xb)
    assert fast.dtype == jnp.bfloat16
    exact = layers.gelu_exact(xb.astype(jnp.float32)).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(fast, dtype=np.float32),
        np.asarray(exact, dtype=np.float32),
        atol=1e-6,
        rtol=2.0 ** -7,
    )


def test_fast_gelu_grads_finite_and_close():
    x = jax.random.normal(jax.random.PRNGKey(0), (4096,), jnp.float32) * 4
    g_fast = jax.grad(lambda x: layers.gelu_bf16_fast(x).sum())(x)
    g_exact = jax.grad(lambda x: layers.gelu_exact(x).sum())(x)
    assert np.isfinite(np.asarray(g_fast)).all()
    # The value fit is 2.6e-5-tight; its derivative is looser but still far
    # below bf16 resolution of typical gradient magnitudes.
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_exact), atol=2e-3)


def test_block_q_slice_matches_full():
    """TransformerBlock(q_slice=P) must equal the last P rows of the full
    block output — the exactness contract of the serving fast path."""
    import jax

    from boxdreamer_tpu.models.layers import TransformerBlock

    blk = TransformerBlock(num_heads=2, qk_norm=True, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    params = blk.init(jax.random.PRNGKey(1), x)
    full = blk.apply(params, x)
    sliced = blk.apply(params, x, True, 8)
    np.testing.assert_allclose(
        np.asarray(sliced), np.asarray(full[:, -8:]), atol=1e-6
    )


def test_betr_query_last_matches_full():
    """BETR(query_last=True) with the query in the LAST frame must produce
    the same heatmaps as the standard masked-einsum selection."""
    import jax

    from boxdreamer_tpu.models.betr import BETR, BETRConfig

    cfg = BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=2, patch_size=14,
        img_size=28, dtype="float32",
    )
    dec = BETR(cfg)
    B, T, P = 2, 3, cfg.tokens_per_frame
    fuse = jax.random.normal(jax.random.PRNGKey(2), (B, T, P, 32))
    masks = jnp.zeros((B, T), dtype=bool).at[:, -1].set(True)
    params = dec.init(
        jax.random.PRNGKey(3), None, None, masks, precomputed_fuse=fuse
    )
    full = dec.apply(params, None, None, masks, precomputed_fuse=fuse)
    fast = dec.apply(
        params, None, None, masks, precomputed_fuse=fuse, query_last=True
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full), atol=1e-6)

    # Contract guard: query NOT last + query_last=True must raise loudly
    # (eager path; silently reading the wrong frame's tokens is the failure
    # mode ADVICE round-3 flagged).
    bad_masks = jnp.zeros((B, T), dtype=bool).at[:, 0].set(True)
    import pytest

    with pytest.raises(ValueError, match="query_last"):
        dec.apply(
            params, None, None, bad_masks, precomputed_fuse=fuse,
            query_last=True,
        )

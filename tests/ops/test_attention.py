import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.ops import attention


def make_qkv(key, B=2, H=4, N=256, D=96, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, H, N, D), dtype=dtype)
    k = jax.random.normal(k2, (B, H, N, D), dtype=dtype)
    v = jax.random.normal(k3, (B, H, N, D), dtype=dtype)
    return q, k, v


def test_reference_matches_naive_softmax():
    q, k, v = make_qkv(jax.random.PRNGKey(0), B=1, H=2, N=32, D=16)
    scale = 16**-0.5
    out = attention.mha_reference(q, k, v, scale)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


@pytest.mark.parametrize("N,D", [(256, 96), (512, 64), (261, 64), (384, 128)])
def test_flash_kernel_matches_reference(N, D):
    """Pallas kernel (interpret mode on CPU) vs the XLA reference — covers
    BETR shapes (N multiple of 256, D=96), DINOv2 shapes (N=261, D=64), and
    aligned shapes."""
    q, k, v = make_qkv(jax.random.PRNGKey(1), B=2, H=2, N=N, D=D)
    scale = D**-0.5
    ref = attention.mha_reference(q, k, v, scale)
    out = attention.flash_attention(q, k, v, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_kernel_bf16():
    q, k, v = make_qkv(jax.random.PRNGKey(2), N=256, D=64, dtype=jnp.bfloat16)
    scale = 64**-0.5
    ref = attention.mha_reference(q, k, v, scale)
    out = attention.flash_attention(q, k, v, scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=0.05
    )


def test_flash_kernel_blocking_invariance():
    q, k, v = make_qkv(jax.random.PRNGKey(3), N=512, D=64)
    scale = 64**-0.5
    a = attention.flash_attention(q, k, v, scale, block_q=128, block_k=128, interpret=True)
    b = attention.flash_attention(q, k, v, scale, block_q=256, block_k=512, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dispatch_runs_on_cpu():
    q, k, v = make_qkv(jax.random.PRNGKey(4), N=128, D=32)
    out = attention.multi_head_attention(q, k, v, 32**-0.5)
    assert out.shape == q.shape


@pytest.mark.parametrize(
    "B,H,N,D", [(1, 2, 64, 32), (1, 1, 300, 48), (2, 2, 640, 64)]
)
def test_pallas_backward_matches_autodiff(B, H, N, D):
    """The Pallas backward kernels (dq via KV streaming, dk/dv via Q
    streaming) must match jax.grad of the reference implementation —
    including at lengths that are not block multiples (padding masking)."""
    q, k, v = make_qkv(jax.random.PRNGKey(7), B=B, H=H, N=N, D=D)
    scale = D**-0.5
    g = jax.random.normal(jax.random.PRNGKey(8), q.shape)

    def ref_loss(q, k, v):
        return (attention.mha_reference(q, k, v, scale) * g).sum()

    def flash_loss(q, k, v):
        return (attention.flash_attention_ad(q, k, v, scale, interpret=True) * g).sum()

    dq_ref, dk_ref, dv_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    dq, dk, dv = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-4)

    # flash_attention_ad length-dispatches its backward (XLA-lse below
    # FLASH_BWD_PALLAS_MIN_SEQ_LEN) — exercise the Pallas backward kernels
    # DIRECTLY at these (non-block-aligned) shapes as well.
    out, lse = attention.flash_attention(
        q, k, v, scale, interpret=True, return_lse=True
    )
    dq_p, dk_p, dv_p = attention.flash_attention_bwd(
        q, k, v, out, lse, g, scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dq_p), np.asarray(dq_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_p), np.asarray(dv_ref), atol=2e-4)


def test_flash_lse_matches_reference():
    """return_lse: logsumexp must equal the reference computation (it is the
    sequence-parallel combination state)."""
    q, k, v = make_qkv(jax.random.PRNGKey(9), B=1, H=2, N=200, D=32)
    scale = 32**-0.5
    out, lse = attention.flash_attention(
        q, k, v, scale, interpret=True, return_lse=True
    )
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(attention.mha_reference(q, k, v, scale)),
        atol=2e-5,
    )


def test_flash_cross_attention_shapes():
    """Nq != Nk (sequence-parallel query shards attend over larger KV)."""
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (1, 2, 128, 32))
    k = jax.random.normal(ks[1], (1, 2, 512, 32))
    v = jax.random.normal(ks[2], (1, 2, 512, 32))
    out = attention.flash_attention(q, k, v, 32**-0.5, interpret=True)
    ref = attention.mha_reference(q, k, v, 32**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


# ---------------------------------------------------------------------------
# fused qk-RMSNorm
# ---------------------------------------------------------------------------


def _ref_qknorm_attention(q, k, v, wq, wk, scale):
    return attention.mha_reference(
        attention.rms_norm(q, wq), attention.rms_norm(k, wk), v, scale
    )


@pytest.mark.parametrize("N,D", [(256, 96), (300, 48)])
def test_fused_qknorm_forward_matches_unfused(N, D):
    """Kernel-fused per-head RMSNorm (raw q/k + weights into the kernel)
    must equal normalize-in-XLA-then-flash, including at non-block-aligned
    lengths and with non-trivial learnable weights."""
    q, k, v = make_qkv(jax.random.PRNGKey(10), B=2, H=2, N=N, D=D)
    q, k = q * 3.0, k * 0.25  # non-unit row norms so rsqrt matters
    wq = jax.random.uniform(jax.random.PRNGKey(11), (D,), jnp.float32, 0.5, 1.5)
    wk = jax.random.uniform(jax.random.PRNGKey(12), (D,), jnp.float32, 0.5, 1.5)
    scale = D**-0.5
    ref = _ref_qknorm_attention(q, k, v, wq, wk, scale)
    out = attention.flash_attention(
        q, k, v, scale, interpret=True, qk_norm_weights=(wq, wk)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_qknorm_lse_matches_reference():
    q, k, v = make_qkv(jax.random.PRNGKey(13), B=1, H=2, N=256, D=64)
    wq = jnp.linspace(0.5, 1.5, 64)
    wk = jnp.linspace(1.5, 0.5, 64)
    scale = 64**-0.5
    _, lse = attention.flash_attention(
        q, k, v, scale, interpret=True, return_lse=True, qk_norm_weights=(wq, wk)
    )
    s = jnp.einsum(
        "bhqd,bhkd->bhqk",
        attention.rms_norm(q, wq),
        attention.rms_norm(k, wk),
        preferred_element_type=jnp.float32,
    ) * scale
    expected = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(expected), atol=2e-5)


@pytest.mark.parametrize("N,D", [(256, 96), (300, 48)])
def test_fused_qknorm_grads_match_autodiff(N, D):
    """The fused custom VJP (flash backward on normalized tensors chained
    through the analytic RMSNorm VJP) must match jax.grad of the plain
    XLA composition — for q, k, v AND the norm weights."""
    q, k, v = make_qkv(jax.random.PRNGKey(14), B=1, H=2, N=N, D=D)
    q, k = q * 2.0, k * 0.5
    wq = jax.random.uniform(jax.random.PRNGKey(15), (D,), jnp.float32, 0.5, 1.5)
    wk = jax.random.uniform(jax.random.PRNGKey(16), (D,), jnp.float32, 0.5, 1.5)
    scale = D**-0.5
    g = jax.random.normal(jax.random.PRNGKey(17), q.shape)

    def ref_loss(q, k, v, wq, wk):
        return (_ref_qknorm_attention(q, k, v, wq, wk, scale) * g).sum()

    def fused_loss(q, k, v, wq, wk):
        return (
            attention._flash_attention_qknorm_ad(q, k, v, wq, wk, scale, True) * g
        ).sum()

    refs = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(q, k, v, wq, wk)
    ours = jax.grad(fused_loss, argnums=(0, 1, 2, 3, 4))(q, k, v, wq, wk)
    for r, o, name in zip(refs, ours, ["dq", "dk", "dv", "dwq", "dwk"]):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=5e-4, err_msg=name
        )


def test_multi_head_attention_qknorm_dispatch_cpu():
    q, k, v = make_qkv(jax.random.PRNGKey(18), N=128, D=32)
    wq = jnp.ones((32,))
    wk = jnp.ones((32,))
    out = attention.multi_head_attention(
        q, k, v, 32**-0.5, qk_norm_weights=(wq, wk)
    )
    ref = _ref_qknorm_attention(q, k, v, wq, wk, 32**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# packed-layout kernel (round 3): qkv read in place from the lane-padded
# projection output, no transpose/pad/slice copies
# ---------------------------------------------------------------------------


def _pack_qkv(q, k, v, Dp=128):
    B, H, N, D = q.shape
    stk = jnp.stack([q, k, v], 0)  # (3, B, H, N, D)
    stk = jnp.transpose(stk, (1, 3, 0, 2, 4))  # (B, N, 3, H, D)
    stk = jnp.pad(stk, ((0, 0),) * 4 + ((0, Dp - D),))
    return stk.reshape(B, N, 3 * H * Dp)


def _unpack_out(out, H, D, Dp=128):
    B, N, _ = out.shape
    return jnp.transpose(out.reshape(B, N, H, Dp)[..., :D], (0, 2, 1, 3))


def _rms_ref(x, w):
    var = jnp.mean(x * x, -1, keepdims=True)
    return x * jax.lax.rsqrt(var + 1e-6) * w


@pytest.mark.parametrize("qk_norm", [False, True])
def test_packed_kernel_matches_reference(qk_norm):
    B, H, N, D = 2, 3, 256, 96
    q, k, v = make_qkv(jax.random.PRNGKey(7), B=B, H=H, N=N, D=D)
    ks = jax.random.split(jax.random.PRNGKey(8), 2)
    wq = jax.random.uniform(ks[0], (D,), jnp.float32, 0.5, 1.5)
    wk = jax.random.uniform(ks[1], (D,), jnp.float32, 0.5, 1.5)
    scale = D**-0.5
    if qk_norm:
        ref = attention.mha_reference(_rms_ref(q, wq), _rms_ref(k, wk), v, scale)
        weights = (wq, wk)
    else:
        ref = attention.mha_reference(q, k, v, scale)
        weights = None
    out = attention.flash_attention_packed(
        _pack_qkv(q, k, v), H, D, scale, weights, interpret=True
    )
    # padding lanes must be exactly zero (the proj matmul relies on it)
    assert float(jnp.abs(out.reshape(B, N, H, 128)[..., D:]).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(_unpack_out(out, H, D)), np.asarray(ref), atol=2e-5
    )


def test_packed_ad_grads_match_reference():
    B, H, N, D, Dp = 1, 2, 128, 96, 128
    q, k, v = make_qkv(jax.random.PRNGKey(9), B=B, H=H, N=N, D=D)
    ks = jax.random.split(jax.random.PRNGKey(10), 2)
    wq = jax.random.uniform(ks[0], (D,), jnp.float32, 0.5, 1.5)
    wk = jax.random.uniform(ks[1], (D,), jnp.float32, 0.5, 1.5)
    scale = D**-0.5
    qkv = _pack_qkv(q, k, v)

    def loss_packed(qkv, wq, wk):
        o = attention.packed_attention_ad(qkv, wq, wk, H, D, scale, True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(qkv, wq, wk):
        q5 = qkv.reshape(B, N, 3, H, Dp)[..., :D]
        qq, kk, vv = (jnp.transpose(q5[:, :, s], (0, 2, 1, 3)) for s in range(3))
        o = attention.mha_reference(_rms_ref(qq, wq), _rms_ref(kk, wk), vv, scale)
        o = jnp.pad(
            jnp.transpose(o, (0, 2, 1, 3)), ((0, 0),) * 3 + ((0, Dp - D),)
        ).reshape(B, N, H * Dp)
        return jnp.sum(jnp.sin(o))

    g1 = jax.grad(loss_packed, argnums=(0, 1, 2))(qkv, wq, wk)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, wq, wk)
    for a, b, name in zip(g1, g2, ("dqkv", "dwq", "dwk")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name
        )


def test_packed_lse_matches_unpacked():
    """The packed kernel's lse output (the training VJP's residual) must
    equal flash_attention's, including with fused qk-norm."""
    B, H, N, D = 2, 2, 256, 96
    q, k, v = make_qkv(jax.random.PRNGKey(11), B=B, H=H, N=N, D=D)
    ks = jax.random.split(jax.random.PRNGKey(12), 2)
    wq = jax.random.uniform(ks[0], (D,), jnp.float32, 0.5, 1.5)
    wk = jax.random.uniform(ks[1], (D,), jnp.float32, 0.5, 1.5)
    scale = D**-0.5
    ref_out, ref_lse = attention.flash_attention(
        q, k, v, scale, interpret=True, return_lse=True,
        qk_norm_weights=(wq, wk),
    )
    out, lse = attention.flash_attention_packed(
        _pack_qkv(q, k, v), H, D, scale, (wq, wk),
        interpret=True, return_lse=True,
    )
    np.testing.assert_allclose(
        np.asarray(_unpack_out(out, H, D)), np.asarray(ref_out), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)


def test_packed_ad_pallas_bwd_path():
    """At N >= FLASH_BWD_PALLAS_MIN_SEQ_LEN the packed VJP rides the Pallas
    backward on the SAVED out/lse (no forward recompute); grads must still
    match the reference composition."""
    B, H, N, D, Dp = 1, 1, attention.FLASH_BWD_PALLAS_MIN_SEQ_LEN, 96, 128
    q, k, v = make_qkv(jax.random.PRNGKey(13), B=B, H=H, N=N, D=D)
    ks = jax.random.split(jax.random.PRNGKey(14), 2)
    wq = jax.random.uniform(ks[0], (D,), jnp.float32, 0.5, 1.5)
    wk = jax.random.uniform(ks[1], (D,), jnp.float32, 0.5, 1.5)
    scale = D**-0.5
    qkv = _pack_qkv(q, k, v)

    def loss_packed(qkv, wq, wk):
        o = attention.packed_attention_ad(qkv, wq, wk, H, D, scale, True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(qkv, wq, wk):
        q5 = qkv.reshape(B, N, 3, H, Dp)[..., :D]
        qq, kk, vv = (jnp.transpose(q5[:, :, s], (0, 2, 1, 3)) for s in range(3))
        o = attention.mha_reference(_rms_ref(qq, wq), _rms_ref(kk, wk), vv, scale)
        o = jnp.pad(
            jnp.transpose(o, (0, 2, 1, 3)), ((0, 0),) * 3 + ((0, Dp - D),)
        ).reshape(B, N, H * Dp)
        return jnp.sum(jnp.sin(o))

    g1 = jax.grad(loss_packed, argnums=(0, 1, 2))(qkv, wq, wk)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, wq, wk)
    for a, b, name in zip(g1, g2, ("dqkv", "dwq", "dwk")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, err_msg=name
        )


def test_pick_block_policy():
    """Blocks are LANE-multiple divisors of the padded length — the N=2048
    pad-to-3072 trap and in-loop VMEM overflows both came from violating
    this (round-3)."""
    for n, req, expect in [
        (2048, 1536, 1024),  # 1536 would pad 2048 -> 3072 (+50% work)
        (1536, 1536, 1536),
        (1536, 512, 512),
        (261, 1536, 384),   # round_up(261,128)=384
        (8192, 1536, 1024),  # 8192 % 1536 != 0 -> steps down to 1024
        (1536, 192, 128),   # non-LANE request rounds DOWN (Mosaic tiling)
        (1536, 100, 128),   # sub-LANE request clamps up to one LANE
    ]:
        got = attention._pick_block(n, req)
        assert got == expect, (n, req, got)
        n_pad = attention._round_up(n, attention.LANE)
        assert n_pad % got == 0 and got % attention.LANE == 0


def test_default_block_q_is_length_adaptive():
    assert attention._default_block_q(1536, attention.DEFAULT_BLOCK_Q) == 512
    assert attention._default_block_q(8192, attention.DEFAULT_BLOCK_Q) == 1536
    # explicit non-default requests are honored
    assert attention._default_block_q(8192, 256) == 256


def test_packed_eligibility_predicate(monkeypatch):
    """Packed path: TPU + flash-length + 128-aligned + qk-norm + no SP
    scope. (On CPU it must always be off — pallas would fail un-interpreted.)"""
    assert not attention.packed_attention_eligible(1536, True)  # cpu backend
    monkeypatch.setattr(
        attention.jax, "default_backend", lambda: "tpu"
    )
    assert attention.packed_attention_eligible(1536, True)
    assert not attention.packed_attention_eligible(1536, False)  # no qk-norm
    assert not attention.packed_attention_eligible(512, True)  # short
    assert not attention.packed_attention_eligible(1540, True)  # unaligned
    attention._SP_STATE["mesh"] = object()
    try:
        assert not attention.packed_attention_eligible(1536, True)  # SP scope
    finally:
        attention._SP_STATE["mesh"] = None

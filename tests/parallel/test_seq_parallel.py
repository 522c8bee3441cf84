"""Sequence-parallel (ring) attention tests on the virtual 8-device CPU mesh.

SURVEY.md §2.5 / VERDICT round-1 item 9: shard the token axis over a mesh
axis, rotate KV shards with ppermute, combine with logsumexp reweighting —
multi-device output must match single-device attention at T*P > 4096 tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.ops import attention
from boxdreamer_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(data=8, model=1, devices=jax.devices()[:8])


def _qkv(key, B=1, H=2, N=4608, D=32, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return (
        jax.random.normal(ks[0], (B, H, N, D), dtype),
        jax.random.normal(ks[1], (B, H, N, D), dtype),
        jax.random.normal(ks[2], (B, H, N, D), dtype),
    )


def test_ring_attention_matches_single_device(mesh8):
    """8-way token sharding, N=4608 (> 4096), XLA inner kernel."""
    q, k, v = _qkv(jax.random.PRNGKey(0))
    scale = q.shape[-1] ** -0.5
    ref = attention.mha_reference(q, k, v, scale)
    out = attention.sequence_parallel_attention(
        q, k, v, scale, mesh8, axis="data", use_flash=False
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_attention_with_flash_inner(mesh8):
    """Same ring with the Pallas flash kernel as the per-shard compute
    (interpret mode on CPU) — proves the kernel composes with shard_map."""
    q, k, v = _qkv(jax.random.PRNGKey(1), N=2048, D=32)
    scale = q.shape[-1] ** -0.5
    ref = attention.mha_reference(q, k, v, scale)
    out = attention.sequence_parallel_attention(
        q, k, v, scale, mesh8, axis="data",
        use_flash=True, interpret=True, block_q=128, block_k=128,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_ring_attention_bf16(mesh8):
    q, k, v = _qkv(jax.random.PRNGKey(2), N=4608, dtype=jnp.bfloat16)
    scale = q.shape[-1] ** -0.5
    ref = attention.mha_reference(q, k, v, scale)
    out = attention.sequence_parallel_attention(
        q, k, v, scale, mesh8, axis="data", use_flash=False
    )
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        atol=2e-2,
    )
    assert out.dtype == jnp.bfloat16


def test_sequence_parallel_scope_dispatch(mesh8):
    """multi_head_attention reroutes through the ring inside the scope and
    produces the same result as outside it."""
    q, k, v = _qkv(jax.random.PRNGKey(3), N=4608)
    scale = q.shape[-1] ** -0.5
    plain = attention.multi_head_attention(q, k, v, scale)
    with attention.sequence_parallel_scope(mesh8, axis="data", min_len=1024):
        ringed = attention.multi_head_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ringed), np.asarray(plain), atol=2e-5)
    # Ineligible length (not divisible by 8) must silently fall back.
    q2, k2, v2 = _qkv(jax.random.PRNGKey(4), N=4100)
    with attention.sequence_parallel_scope(mesh8, axis="data", min_len=1024):
        out2 = attention.multi_head_attention(q2, k2, v2, scale)
    np.testing.assert_allclose(
        np.asarray(out2),
        np.asarray(attention.mha_reference(q2, k2, v2, scale)),
        atol=2e-5,
    )


def test_dense_predict_sequence_parallel_matches(mesh8):
    """models/dense.py wiring: dense_predict with sequence_parallel on the
    8-device mesh matches the single-device result (CLAUDE.md round-3 #2)."""
    from tests.models.test_dense import TINY, make_batch
    from boxdreamer_tpu.models import BoxDreamer
    from boxdreamer_tpu.models import dense as D

    model = BoxDreamer(TINY)
    # 7 refs + 1 query = 8 decoder frames x 4 tokens/frame = 32 tokens,
    # divisible by the 8-way mesh.
    batch = make_batch(jax.random.PRNGKey(7), T=8)
    mask = jnp.zeros((1, 8), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(8), batch["images"], batch["bbox_feat"], mask
    )
    cfg_sp = D.DenseConfig(
        enable=True, filter_enable=False, multi_round=False,
        sequence_parallel=True, sp_axis="data", sp_min_len=8,
    )
    cfg_plain = D.DenseConfig(enable=True, filter_enable=False, multi_round=False)
    out_sp = D.dense_predict(model, params, batch, cfg_sp, mesh=mesh8)
    out_plain = D.dense_predict(model, params, batch, cfg_plain)
    np.testing.assert_allclose(
        np.asarray(out_sp["pred_bbox"]),
        np.asarray(out_plain["pred_bbox"]),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sp["pred_poses"]),
        np.asarray(out_plain["pred_poses"]),
        atol=1e-3,
    )


def test_ring_attention_gradients_match_single_device(mesh8):
    """Custom VJP of the ring (backward ring with traveling dk/dv
    accumulators): grads of a nonlinear loss must match jax.grad of the
    single-device reference (VERDICT round-2 item 3)."""
    q, k, v = _qkv(jax.random.PRNGKey(5), N=1024)
    scale = q.shape[-1] ** -0.5

    def loss_ring(q, k, v):
        o = attention.sequence_parallel_attention(
            q, k, v, scale, mesh8, axis="data", use_flash=False
        )
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention.mha_reference(q, k, v, scale)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=name
        )


def test_ring_attention_gradients_under_jit(mesh8):
    """Same under jit with sharded inputs — the production training path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(jax.random.PRNGKey(6), N=2048)
    scale = q.shape[-1] ** -0.5
    sh = NamedSharding(mesh8, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def grads(q, k, v):
        def loss(q, k, v):
            o = attention.sequence_parallel_attention(
                q, k, v, scale, mesh8, axis="data", use_flash=False
            )
            return jnp.sum(o * o)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    g_ring = grads(qs, ks, vs)

    def loss_ref(q, k, v):
        return jnp.sum(attention.mha_reference(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
        )


def test_sequence_parallel_training_gradients(mesh8):
    """END-TO-END sequence-parallel TRAINING: loss + parameter gradients of
    a transformer stack computed under sequence_parallel_scope (ring
    attention with its custom VJP) must match the plain single-device path.
    This is what round-2's forward-only ring could not do."""
    import flax.linen as fnn

    from boxdreamer_tpu.models.layers import TransformerBlock

    class Stack(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            for i in range(2):
                x = TransformerBlock(
                    num_heads=2, qk_norm=True, dtype=jnp.float32, name=f"b{i}"
                )(x, False)
            return x

    model = Stack()
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 64, 16))
    params = model.init(jax.random.PRNGKey(12), x)

    def loss(p, x):
        return jnp.sum(model.apply(p, x) ** 2) * 1e-3

    v_plain, g_plain = jax.value_and_grad(loss)(params, x)
    with attention.sequence_parallel_scope(mesh8, axis="data", min_len=8):
        v_sp, g_sp = jax.value_and_grad(loss)(params, x)

    np.testing.assert_allclose(float(v_sp), float(v_plain), rtol=1e-5)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_s = jax.tree_util.tree_leaves(g_sp)
    assert len(flat_p) == len(flat_s)
    for (path, a), b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )

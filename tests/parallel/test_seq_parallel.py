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

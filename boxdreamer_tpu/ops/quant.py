"""int8 quantized matmul for the serving path (opt-in).

v5e's MXU runs int8 at ~2x the bf16 rate; measured at the flagship BETR
shapes the end-to-end win including dequant epilogues is 1.2-1.9x per
matmul (tools/int8_probe.py). This module provides the symmetric-int8
GEMM used by the opt-in quantized serving mode
(``BETRConfig.quantize='int8'``):

* **weights**: symmetric per-output-channel int8, quantized once per
  dispatch from the f32 params (a ~45 us/layer pass; weights are
  loop-invariant so XLA hoists it out of serving scan chains);
* **activations**: symmetric per-row (per-token) dynamic int8 — one
  abs-max reduction + scale pass per matmul, the standard "dynamic
  quantization" recipe (LLM.int8()/AQT-style, without the outlier split);
* **accumulation**: int32 on the MXU, dequantized to bf16 in the epilogue
  as ``(row_scale * col_scale) * acc``.

The mode is serving-only by design: no quantized VJP exists, callers gate
on ``deterministic``. The reference has no quantized path (TPU-native
addition); the bf16 path remains the default and the benchmark protocol.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight_int8(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a (K, N) weight.

    Returns ``(w_int8, scale)`` with ``scale`` of shape (1, N) f32 such
    that ``w ~= w_int8 * scale``.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), scale


def quantize_rows_int8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row dynamic int8 quantization of (..., K) activations.

    Returns ``(x_int8, scale)`` with ``scale`` shaped like x with the last
    dim = 1, so ``x ~= x_int8 * scale``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def _quantize_rows_kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)  # (block_m, K)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q_ref[...] = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    s_ref[...] = scale


def quantize_rows_int8_fused(
    x2: jax.Array, block_m: int = 256, interpret: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Single-HBM-pass per-row quantize (Pallas). TRIED AND MEASURED SLOWER
    (round 5, tools/int8_serving_ab.py --only int8,int8_fusedq, same-day
    chain slopes on v5e): full int8 serving chain 22.16 ms/step with this
    kernel vs 21.16 with the XLA twin — XLA already fuses the abs-max
    reduction into the activation's producer, so the hypothesized second
    HBM read does not exist, and the extra kernel dispatch breaks XLA's
    quantize-into-consumer fusion. Kept opt-in
    (FUSED_QUANTIZE_BLOCK_M=None default) and interpret-tested; x2 must be
    2D (M, K) with M a multiple of block_m and K lane-aligned."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x2.shape
    grid = (M // block_m,)
    q, s = pl.pallas_call(
        _quantize_rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, K), jnp.int8),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2)
    return q, s


# Measured dispatch for the fused quantize (set after the round-5 on-chip
# A/B; None disables). Requires TPU, 2D lane-aligned inputs.
FUSED_QUANTIZE_BLOCK_M: "int | None" = None


def int8_matmul(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype: jnp.dtype = jnp.bfloat16,
) -> jax.Array:
    """``x @ w (+ bias)`` through the int8 MXU path.

    x: (..., K) activations (any float dtype; dynamically quantized
    per row). w: (K, N) float weight (quantized per output channel).
    Returns (..., N) in ``out_dtype``.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    bm = FUSED_QUANTIZE_BLOCK_M
    if (
        bm
        and jax.default_backend() == "tpu"
        and x2.shape[0] % bm == 0
        and K % 128 == 0
    ):
        xq, sx = quantize_rows_int8_fused(x2, block_m=bm)
    else:
        xq, sx = quantize_rows_int8(x2)
    wq, sw = quantize_weight_int8(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, w.shape[1])

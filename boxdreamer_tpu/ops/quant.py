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
    xq, sx = quantize_rows_int8(x2)
    wq, sw = quantize_weight_int8(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, w.shape[1])

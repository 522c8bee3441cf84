"""Prologue-fused matmuls (Pallas): elementwise prologue + MXU matmul in one
kernel, eliminating the HBM round-trip of the materialized prologue output.

In the BETR block the three non-matmul passes XLA cannot fuse into a dot are

  * gelu between fc1 and fc2 — reads+writes the (B*N, 4d) hidden
    (~150 MB/layer at the flagship shape, ~0.18 ms/layer of pure HBM),
  * the residual add + LayerNorm feeding fc1,
  * the LayerNorm feeding the qkv projection,

because XLA materializes every dot operand. Here the prologue runs on the
VPU over the x-tile already resident in VMEM while the MXU consumes it:

  * :func:`gelu_matmul`       y = gelu_fast(x) @ w (+ b)
  * :func:`ln_matmul`         y = LN(x [+ h]) @ w (+ b), also returns x+h
                              (the next residual stream) when ``h`` given

Both are differentiable via custom VJPs that recompute the cheap prologue
in XLA (one extra elementwise pass in the backward only).

The grid is (M tiles, C tiles); the output columns are blocked so the
weight tile stays within the ~16 MB scoped-VMEM budget (measured OOM at
19.5 MB with a whole 768x3072 f32 weight; the prologue is recomputed per
column tile — VPU work that overlaps the MXU).

bf16-oriented: the gelu prologue is the same precision-matched fast GELU the
production block uses (models/layers.py gelu_bf16_fast, max deviation 2.6e-5
from exact erf); LN math is f32 in-kernel, identical to nn.LayerNorm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# gelu(x) ~= x * sigmoid(c1*x + c3*x^3 + c5*x^5) — minimax fit against the
# EXACT erf GELU; identical constants to models/layers.py:gelu_bf16_fast.
_GELU_C1 = -2.0 * 1.4426950408889634 * 0.797507884
_GELU_C3 = -2.0 * 1.4426950408889634 * 0.0370056460
_GELU_C5 = -2.0 * 1.4426950408889634 * -3.51516781e-04


def _gelu_fast_f32(xf):
    xc = jnp.clip(xf, -6.0, 6.0)
    x2 = xc * xc
    u = xc * (_GELU_C1 + x2 * (_GELU_C3 + x2 * _GELU_C5))
    return xf / (1.0 + jnp.exp2(u))


def gelu_fast(x):
    """XLA twin of the kernel prologue (used by the VJP recompute)."""
    return _gelu_fast_f32(x.astype(jnp.float32)).astype(x.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_block_c(K, C, block_m, itemsize, n_row_bufs, budget=12 * 2**20):
    """Column tile: largest divisor of C that is a LANE multiple (Mosaic
    tiling: last block dim must be 128-divisible or the full dim) keeping
    everything within the scoped-VMEM budget. Every block that changes
    across grid steps is double-buffered by the pipeline: w (K, bc),
    ``n_row_bufs`` row blocks (block_m, K), y (block_m, bc)."""

    def cost(bc):
        return (2 * K * bc + 2 * block_m * (n_row_bufs * K + bc)) * itemsize

    candidates = [C] + [
        k * LANE
        for k in range(C // LANE, 0, -1)
        if C % (k * LANE) == 0 and k * LANE < C
    ]
    for bc in candidates:
        if cost(bc) <= budget:
            return bc
    return candidates[-1]


# ---------------------------------------------------------------------------
# gelu @ w
# ---------------------------------------------------------------------------


def _gelu_matmul_kernel(x_ref, w_ref, b_ref, y_ref, *, has_bias):
    x = x_ref[...]
    g = _gelu_fast_f32(x.astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot_general(
        g, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        y = y + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gelu_matmul(x, w, b=None, block_m: int = 256, interpret: bool = False):
    """y = gelu_fast(x) @ w (+ b). x: (M, K); w: (K, C); b: (C,) or None."""
    return _gelu_matmul_fwd_impl(x, w, b, block_m, interpret)


def _gelu_matmul_fwd_impl(x, w, b, block_m, interpret):
    M, K = x.shape
    C = w.shape[1]
    has_bias = b is not None
    Mp = _round_up(M, block_m)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    block_c = _pick_block_c(K, C, block_m, x.dtype.itemsize, n_row_bufs=1)
    inputs = [x, w]
    in_specs = [
        pl.BlockSpec((block_m, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, block_c), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        inputs.append(b.reshape(1, C))
        in_specs.append(
            pl.BlockSpec((1, block_c), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        )
    else:
        inputs.append(jnp.zeros((1, 1), x.dtype))
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
        )
    y = pl.pallas_call(
        functools.partial(_gelu_matmul_kernel, has_bias=has_bias),
        grid=(Mp // block_m, C // block_c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, block_c), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, C), x.dtype),
        interpret=interpret,
    )(*inputs)
    return y[:M]


def _gelu_matmul_fwd(x, w, b, block_m, interpret):
    return _gelu_matmul_fwd_impl(x, w, b, block_m, interpret), (x, w, b)


def _gelu_matmul_bwd(block_m, interpret, res, dy):
    x, w, b = res
    if b is None:
        _, vjp = jax.vjp(lambda x, w: gelu_fast(x) @ w, x, w)
        dx, dw = vjp(dy)
        return dx, dw, None
    _, vjp = jax.vjp(
        lambda x, w, b: gelu_fast(x) @ w + b.astype(x.dtype), x, w, b
    )
    return vjp(dy)


gelu_matmul.defvjp(_gelu_matmul_fwd, _gelu_matmul_bwd)


# ---------------------------------------------------------------------------
# LN(x [+ h]) @ w
# ---------------------------------------------------------------------------


def _ln_matmul_kernel(
    x_ref, h_ref, w_ref, g_ref, bt_ref, b_ref, y_ref, t_ref,
    *, has_residual, has_bias, eps,
):
    xf = x_ref[...].astype(jnp.float32)
    if has_residual:
        xf = xf + h_ref[...].astype(jnp.float32)

        @pl.when(pl.program_id(1) == 0)
        def _write_t():
            t_ref[...] = xf.astype(t_ref.dtype)

    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    n = xc * jax.lax.rsqrt(var + eps)
    n = n * g_ref[...].astype(jnp.float32) + bt_ref[...].astype(jnp.float32)
    y = jax.lax.dot_general(
        n.astype(y_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        y = y + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def ln_matmul(x, h, w, gamma, beta, b, eps: float = 1e-5,
              block_m: int = 256, interpret: bool = False):
    """(y, t): t = x + h (or x when h is None), y = LN(t)*gamma+beta @ w (+b).

    One kernel replaces the residual-add pass, the LayerNorm pass, and the
    matmul's operand read. Returns t so the caller keeps the residual
    stream without re-reading x and h.
    """
    return _ln_matmul_fwd_impl(x, h, w, gamma, beta, b, eps, block_m, interpret)


def _ln_matmul_fwd_impl(x, h, w, gamma, beta, b, eps, block_m, interpret):
    M, K = x.shape
    C = w.shape[1]
    has_residual = h is not None
    has_bias = b is not None
    Mp = _round_up(M, block_m)
    pad = Mp != M
    xp = jnp.pad(x, ((0, Mp - M), (0, 0))) if pad else x
    hp = (jnp.pad(h, ((0, Mp - M), (0, 0))) if pad else h) if has_residual \
        else jnp.zeros((1, 1), x.dtype)
    bp = b.reshape(1, C) if has_bias else jnp.zeros((1, 1), x.dtype)
    block_c = _pick_block_c(K, C, block_m, x.dtype.itemsize, n_row_bufs=3)

    row = lambda i, j: (i, 0)
    col = lambda i, j: (0, j)
    cell = lambda i, j: (i, j)
    fixed = lambda i, j: (0, 0)
    in_specs = [
        pl.BlockSpec((block_m, K), row, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (block_m, K) if has_residual else (1, 1),
            row if has_residual else fixed, memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((K, block_c), col, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, block_c) if has_bias else (1, 1),
            col if has_bias else fixed, memory_space=pltpu.VMEM,
        ),
    ]
    y, t = pl.pallas_call(
        functools.partial(
            _ln_matmul_kernel, has_residual=has_residual, has_bias=has_bias,
            eps=eps,
        ),
        grid=(Mp // block_m, C // block_c),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_m, block_c), cell, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_m, K) if has_residual else (1, 1),
                row if has_residual else fixed, memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, C), x.dtype),
            jax.ShapeDtypeStruct(
                (Mp, K) if has_residual else (1, 1), x.dtype
            ),
        ],
        interpret=interpret,
    )(xp, hp, w, gamma.reshape(1, K), beta.reshape(1, K), bp)
    t = t[:M] if has_residual else x
    return y[:M], t


def _ln_ref(x, h, w, gamma, beta, b, eps):
    t = x + h if h is not None else x
    tf = t.astype(jnp.float32)
    mu = jnp.mean(tf, -1, keepdims=True)
    xc = tf - mu
    var = jnp.mean(xc * xc, -1, keepdims=True)
    n = (xc * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)
    y = n @ w
    if b is not None:
        y = y + b.astype(y.dtype)
    return y, t


def _ln_matmul_fwd(x, h, w, gamma, beta, b, eps, block_m, interpret):
    out = _ln_matmul_fwd_impl(x, h, w, gamma, beta, b, eps, block_m, interpret)
    return out, (x, h, w, gamma, beta, b)


def _ln_matmul_bwd(eps, block_m, interpret, res, cot):
    x, h, w, gamma, beta, b = res
    diff = [x] + ([h] if h is not None else []) + [w, gamma, beta] \
        + ([b] if b is not None else [])

    def ref(*a):
        it = iter(a)
        xx = next(it)
        hh = next(it) if h is not None else None
        ww, gg, bb = next(it), next(it), next(it)
        bias = next(it) if b is not None else None
        return _ln_ref(xx, hh, ww, gg, bb, bias, eps)

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(cot))
    out = [grads.pop(0)]
    out.append(grads.pop(0) if h is not None else None)
    out.extend([grads.pop(0), grads.pop(0), grads.pop(0)])
    out.append(grads.pop(0) if b is not None else None)
    return tuple(out)


ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)

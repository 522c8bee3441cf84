"""Shared transformer building blocks (Flax).

Functional equivalents of the reference's block zoo
(src/models/modules/backbone/utils/blocks.py): pre-LN self-attention block
with optional per-head RMSNorm on q/k, optional LayerScale (DINOv2), and the
timm-style MLP. Attention itself routes through the TPU Pallas kernel
(boxdreamer_tpu/ops/attention.py).

Numerics parity notes vs the reference:
  * GELU is the exact (erf) variant — torch ``nn.GELU`` default.
  * Block LayerNorm eps is 1e-5 (reference get_layernorm hardcodes 1e-5 at
    blocks.py:805 despite being called with 1e-6); DINOv2 uses 1e-6.
  * qk-norm is LlamaRMSNorm over the head dim with learnable scale
    (blocks.py:231-232).
  * The attention softmax runs in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.ops.attention import multi_head_attention


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


# Fast GELU for bf16 compute paths. XLA's exact-erf GELU costs ~40 VPU ops
# per element (rational erf + erfc tail, both branches evaluated) and is the
# single largest non-matmul cost in the BETR stack (+7 ms/step of 30 at the
# flagship shape, measured via tools/attend_anatomy.py). This sigmoid form
#     gelu(x) ~= x * sigmoid(b1*xc + b3*xc^3 + b5*xc^5),  xc = clip(x, +-6)
# uses coefficients minimax-fitted against the EXACT erf GELU (not the
# standard tanh approximation): max absolute deviation 2.6e-5 over all
# reals — ~150x below bf16 resolution (eps 2^-8), and its bf16-ULP error
# tail is indistinguishable from the f32-vs-f64 noise floor of the exact
# computation itself. The sigmoid is computed with a single exp2 (TPU-native
# transcendental), ~10 VPU ops total. Only used when the input is bf16;
# f32 paths (golden parity tests, reference comparisons) keep exact erf.
_GELU_C1 = -2.0 * 1.4426950408889634 * 0.797507884
_GELU_C3 = -2.0 * 1.4426950408889634 * 0.0370056460
_GELU_C5 = -2.0 * 1.4426950408889634 * -3.51516781e-04


def gelu_bf16_fast(x):
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -6.0, 6.0)
    x2 = xc * xc
    u = xc * (_GELU_C1 + x2 * (_GELU_C3 + x2 * _GELU_C5))
    return (xf / (1.0 + jnp.exp2(u))).astype(x.dtype)


def gelu(x):
    """Exact erf GELU in f32/f64; precision-matched fast GELU in bf16."""
    if x.dtype == jnp.bfloat16:
        return gelu_bf16_fast(x)
    return gelu_exact(x)


class RMSNorm(nn.Module):
    """Llama-style RMSNorm: x * rsqrt(mean(x^2) + eps) * weight, computed in
    float32 (reference LlamaRMSNorm semantics)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + self.eps)
        return (out * w).astype(dtype)


class Mlp(nn.Module):
    """timm-style MLP: Linear -> GELU -> Linear (dropout only in training).

    ``quantize='int8'``: serving-only int8 MXU path (ops/quant.py) — fc1/fc2
    run as dynamic per-row x per-channel symmetric int8 GEMMs when
    ``deterministic``; the non-deterministic (training) call falls back to
    float math on the SAME param tree, so checkpoints are mode-agnostic."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    dropout: float = 0.0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        if self.quantize == "int8":
            from boxdreamer_tpu.ops import quant

            fc1_k, fc1_b = _DenseParams(
                in_features, hidden, self.use_bias, name="fc1"
            )()
            fc2_k, fc2_b = _DenseParams(hidden, out, self.use_bias, name="fc2")()
            if deterministic:
                x = quant.int8_matmul(x, fc1_k, fc1_b, out_dtype=self.dtype)
                x = gelu(x)
                return quant.int8_matmul(x, fc2_k, fc2_b, out_dtype=self.dtype)
            x = x.astype(self.dtype) @ fc1_k.astype(self.dtype)
            if fc1_b is not None:
                x = x + fc1_b.astype(self.dtype)
            x = gelu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            x = x @ fc2_k.astype(self.dtype)
            if fc2_b is not None:
                x = x + fc2_b.astype(self.dtype)
            return nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(hidden, use_bias=self.use_bias, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(out, use_bias=self.use_bias, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _LNParams(nn.Module):
    """Declares nn.LayerNorm-compatible (scale, bias) params at this
    module's scope — same tree path as ``nn.LayerNorm(name=...)`` so
    checkpoints are unaffected when the norm is fused into a matmul kernel
    (ops/fused_matmul.py)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class _RMSNormWeight(nn.Module):
    """Declares the (features,) RMSNorm weight at this module's scope and
    returns it — same param path/shape as :class:`RMSNorm`, so checkpoints
    and the torch converter are unaffected when the norm itself is applied
    elsewhere (fused into the attention kernel)."""

    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "weight", nn.initializers.ones, (self.features,), jnp.float32
        )


class _DenseParams(nn.Module):
    """Declares nn.Dense-compatible (kernel, bias) params at this module's
    scope and returns them — same tree path/shape/init as ``nn.Dense(name=
    ...)``, so checkpoints and the torch converter are unaffected when the
    matmul itself is reshaped (packed attention pads the kernel lanes)."""

    features_in: int
    features_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.features_in, self.features_out),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class Attention(nn.Module):
    """Multi-head self-attention with fused qkv projection.

    Mirrors the reference Attention (blocks.py:208-302): fused qkv Linear
    (optional bias), optional RMSNorm on per-head q/k, softmax scale
    ``head_dim**-0.5``, output projection. Dispatches to the Pallas flash
    kernel on TPU; the qk-RMSNorm is applied inside the kernel on the flash
    path — saves two full HBM round-trips at the flagship shape.

    At flash-eligible 128-aligned lengths with qk-norm (the BETR flagship
    path), the PACKED layout serves instead: the qkv matmul writes
    (B, N, 3*H*Dp) with lane-padded kernels and the Pallas kernel reads the
    head tiles in place (ops/attention.py:flash_attention_packed) — this
    removes the qkv transpose, the 96->128 pad copies, and the output
    slice+transpose, measured -3.5 ms/step on the 12-layer attend stack at
    B=8/N=1536 (tools/attend_anatomy.py prod vs prod_packed).
    """

    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, q_slice: Optional[int] = None,
                 pre_ln=None, allow_packed: bool = True,
                 quantized: bool = False):
        """``q_slice``: compute outputs only for the LAST ``q_slice`` tokens
        (they still attend over all N keys). Exact for consumers that only
        read those positions — the serving path's final BETR layer, where
        only the query frame's tokens reach the head.

        ``quantized``: run the qkv and output projections through the int8
        MXU path (ops/quant.py; serving-only — callers gate on
        deterministic). Attention itself stays bf16 in the Pallas kernel.
        Asymmetry when ``pre_ln`` is also set: the qkv GEMM stays on the
        fused-LN float kernel (no int8 LN-fused GEMM exists) and only the
        output projection quantizes — effective int8 coverage is therefore
        config-dependent (full with pre_ln=None, proj-only otherwise).

        ``pre_ln``: optional (gamma, beta, eps) — x arrives RAW and the
        LayerNorm fuses into the qkv matmul kernel (ops/fused_matmul.py),
        removing the materialized-normalized-x HBM pass.

        ``allow_packed``: serving-only dispatch switch. The packed VJP
        saves its forward's out+lse residuals (no forward recompute,
        ops/attention.py:_packed_ad_bwd), but an honest A/B of the 12-layer
        train stack at flagship B8/N1536 (chain-slope, fetch-timed,
        round 4) measured packed 79.96 vs unpacked 77.25 ms/step: the
        backward's dq/dk/dv repack transposes outweigh the forward's
        copy-free reads when gradients flow. Callers therefore pass
        ``deterministic`` here — packed serves eval/serving, the unpacked
        flash path trains."""
        from boxdreamer_tpu.ops import attention as attn_ops
        from boxdreamer_tpu.ops import fused_matmul as fused

        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        scale = D**-0.5
        dtype = self.dtype
        qkv_kernel, qkv_b = _DenseParams(C, 3 * C, self.qkv_bias, name="qkv")()
        proj_kernel, proj_b = _DenseParams(C, C, self.qkv_bias, name="proj")()
        norm_weights = None
        if self.qk_norm:
            norm_weights = (
                _RMSNormWeight(D, name="q_norm")(),
                _RMSNormWeight(D, name="k_norm")(),
            )

        x = x.astype(dtype)

        def qkv_project(kernel, bias):
            if pre_ln is None:
                out = x @ kernel
                return out + bias if bias is not None else out
            gamma, beta, eps = pre_ln
            y2, _ = fused.ln_matmul(
                x.reshape(B * N, C), None, kernel, gamma, beta, bias, eps
            )
            return y2.reshape(B, N, kernel.shape[1])

        if (
            allow_packed
            and q_slice is None
            and attn_ops.packed_attention_eligible(N, self.qk_norm)
        ):
            Dp = attn_ops._round_up(D, attn_ops.LANE)
            kw = jnp.pad(
                qkv_kernel.reshape(C, 3, H, D), ((0, 0),) * 3 + ((0, Dp - D),)
            ).reshape(C, 3 * H * Dp)
            kb = None
            if qkv_b is not None:
                kb = jnp.pad(
                    qkv_b.reshape(3, H, D), ((0, 0), (0, 0), (0, Dp - D))
                ).reshape(-1).astype(dtype)
            if quantized and pre_ln is None:
                from boxdreamer_tpu.ops import quant

                qkv = quant.int8_matmul(x, kw, kb, out_dtype=dtype)
            else:
                qkv = qkv_project(kw.astype(dtype), kb)
            out = attn_ops.packed_attention_ad(
                qkv, norm_weights[0], norm_weights[1], H, D, scale
            )  # (B, N, H*Dp)
            pw = jnp.pad(
                proj_kernel.reshape(H, D, C), ((0, 0), (0, Dp - D), (0, 0))
            ).reshape(H * Dp, C)
            if quantized:
                from boxdreamer_tpu.ops import quant

                out = quant.int8_matmul(out, pw, None, out_dtype=dtype)
            else:
                out = out @ pw.astype(dtype)
        else:
            if quantized and pre_ln is None:
                from boxdreamer_tpu.ops import quant

                qkv = quant.int8_matmul(
                    x, qkv_kernel,
                    qkv_b if qkv_b is not None else None,
                    out_dtype=dtype,
                )
            else:
                qkv = qkv_project(
                    qkv_kernel.astype(dtype),
                    qkv_b.astype(dtype) if qkv_b is not None else None,
                )
            qkv = qkv.reshape(B, N, 3, H, D)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, H, N, D)
            q, k, v = qkv[0], qkv[1], qkv[2]
            if q_slice is not None:
                q = q[:, :, -q_slice:, :]
            out = multi_head_attention(
                q, k, v, scale=scale, qk_norm_weights=norm_weights
            )
            n_out = N if q_slice is None else q_slice
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, n_out, C)
            if quantized:
                from boxdreamer_tpu.ops import quant

                out = quant.int8_matmul(out, proj_kernel, None, out_dtype=dtype)
            else:
                out = out @ proj_kernel.astype(dtype)
        if proj_b is not None:
            out = out + proj_b.astype(dtype)
        return out


class LayerScale(nn.Module):
    """DINOv2 LayerScale: elementwise learnable gamma."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.init_value),
            (x.shape[-1],),
            jnp.float32,
        )
        return x * gamma.astype(x.dtype)


class _MlpParams(nn.Module):
    """Declares Mlp-compatible fc1/fc2 params (same tree as ``Mlp(name=
    'mlp')``) for the fused-kernel block path."""

    features_in: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.features_in, self.hidden, True, name="fc1")()
        fc2 = _DenseParams(self.hidden, self.features_in, True, name="fc2")()
        return fc1, fc2


class TransformerBlock(nn.Module):
    """Pre-LN transformer block (reference SelfAttentionBlock,
    blocks.py:808-886, and DINOv2 NestedTensorBlock when layerscale is on).

    Tried and REVERTED (round 3): a fully prologue-fused path (LN1 into the
    qkv matmul, residual+LN2 into fc1, gelu into fc2 via
    ops/fused_matmul.py). Slope-measured honestly (distinct inputs per
    dispatch) it ran 24.5 vs 19.4 ms/step at the flagship 12-layer shape —
    XLA's tuned dot beats the naive in-kernel matmul by more than the
    ~2-3 ms of elementwise HBM passes it saves. The kernels remain in
    ops/fused_matmul.py (tested, differentiable) via ``use_fused_prologues``
    for shapes where the trade flips."""

    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    qkv_bias: bool = True
    ln_eps: float = 1e-5
    layerscale_init: Optional[float] = None  # None => no LayerScale
    dtype: jnp.dtype = jnp.float32
    use_fused_prologues: bool = False  # see docstring: measured slower
    # 'int8': opt-in quantized SERVING path (deterministic calls only; the
    # training fall-back is float math on the same params). See ops/quant.py
    # and tools/int8_probe.py for the measured per-matmul wins.
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 q_slice: Optional[int] = None):
        """``q_slice``: produce the block output only for the last
        ``q_slice`` tokens (exact; see Attention.__call__). Returns
        (B, q_slice, C) instead of (B, N, C)."""
        import jax as _jax

        C = x.shape[-1]
        attn = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            dtype=self.dtype,
            name="attn",
        )
        quantized = self.quantize == "int8" and deterministic
        fused_ok = (
            self.use_fused_prologues
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and _jax.default_backend() == "tpu"
            and x.ndim == 3
        )
        if fused_ok:
            from boxdreamer_tpu.ops import fused_matmul as fused

            dtype = jnp.dtype(self.dtype)
            x = x.astype(dtype)
            g1, b1 = _LNParams(C, name="norm1")()
            g2, b2 = _LNParams(C, name="norm2")()
            (fc1_k, fc1_b), (fc2_k, fc2_b) = _MlpParams(
                C, int(C * self.mlp_ratio), name="mlp"
            )()
            # quantize composes partially here: the ln-fused qkv GEMM and
            # the fused fc1/fc2 kernels stay float (fusing LN/GELU into an
            # int8 GEMM isn't built); the attention output projection does
            # quantize — same pre_ln asymmetry as the unpacked branch.
            h = attn(x, q_slice=q_slice, pre_ln=(g1, b1, self.ln_eps),
                     allow_packed=deterministic, quantized=quantized)
            if self.layerscale_init is not None:
                h = LayerScale(self.layerscale_init, name="ls1")(h)
            if q_slice is not None:
                x = x[:, -q_slice:]
            B, N, _ = x.shape
            # residual add + LN2 + fc1 in one kernel (emits the residual
            # stream t = x + h), then GELU + fc2 in another.
            y, t = fused.ln_matmul(
                x.reshape(B * N, C), h.reshape(B * N, C),
                fc1_k.astype(dtype), g2, b2, fc1_b.astype(dtype),
                self.ln_eps,
            )
            m = fused.gelu_matmul(y, fc2_k.astype(dtype), fc2_b.astype(dtype))
            if self.layerscale_init is not None:
                m = LayerScale(self.layerscale_init, name="ls2")(m)
            return (t + m).reshape(B, N, C)

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        h = attn(h, q_slice=q_slice, allow_packed=deterministic,
                 quantized=quantized)
        if self.layerscale_init is not None:
            h = LayerScale(self.layerscale_init, name="ls1")(h)
        if q_slice is not None:
            x = x[:, -q_slice:]
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            hidden_features=int(C * self.mlp_ratio),
            dtype=self.dtype,
            quantize=self.quantize,
            name="mlp",
        )(h, deterministic=deterministic)
        if self.layerscale_init is not None:
            h = LayerScale(self.layerscale_init, name="ls2")(h)
        return x + h


def get_2d_sincos_pos_embed(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """2D sin-cos positional embedding, (grid_h*grid_w, embed_dim).

    Matches the reference layout (src/models/modules/backbone/utils/
    pos_encodiong.py:125-213): for a patch at (row i, col j), the first half
    of the embedding encodes x=j, the second half y=i; tokens are flattened
    row-major. Computed once on host in float64.
    """
    assert embed_dim % 4 == 0

    def emb_1d(pos):
        half = embed_dim // 4
        omega = np.arange(half, dtype=np.float64) / half
        omega = 1.0 / (10000.0**omega)
        out = np.outer(pos, omega)  # (M, half)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)  # (M, d/2)

    ys, xs = np.meshgrid(
        np.arange(grid_h, dtype=np.float64),
        np.arange(grid_w, dtype=np.float64),
        indexing="ij",
    )
    emb_x = emb_1d(xs.reshape(-1))
    emb_y = emb_1d(ys.reshape(-1))
    return np.concatenate([emb_x, emb_y], axis=1).astype(np.float32)


def patchify(imgs: jax.Array, patch_size: int) -> jax.Array:
    """(..., C, H, W) -> (..., (H/p)*(W/p), p*p*C) with the reference's
    channel-last-in-patch layout (betr.py:211-228): flat index =
    (row_in_patch * p + col_in_patch) * C + channel."""
    *lead, C, H, W = imgs.shape
    p = patch_size
    h, w = H // p, W // p
    x = imgs.reshape(*lead, C, h, p, w, p)
    # (..., C, h, p, w, q) -> (..., h, w, p, q, C)
    nlead = len(lead)
    perm = tuple(range(nlead)) + tuple(
        nlead + i for i in (1, 3, 2, 4, 0)
    )
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, h * w, p * p * C)


def unpatchify(x: jax.Array, patch_size: int, channels: int) -> jax.Array:
    """Inverse of :func:`patchify` for square grids:
    (..., L, p*p*C) -> (..., C, H, W)."""
    *lead, L, _ = x.shape
    p = patch_size
    h = w = int(round(L**0.5))
    assert h * w == L, f"non-square token grid: {L}"
    x = x.reshape(*lead, h, w, p, p, channels)
    nlead = len(lead)
    perm = tuple(range(nlead)) + tuple(nlead + i for i in (4, 0, 2, 1, 3))
    x = jnp.transpose(x, perm)  # (..., C, h, p, w, q)
    return x.reshape(*lead, channels, h * p, w * p)

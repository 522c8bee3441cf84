"""Fused multi-head attention for TPU: Pallas flash kernels + XLA reference.

Replaces the reference's attention backend switch (flash-attn CUDA -> torch
SDPA -> naive matmul, src/models/modules/backbone/utils/blocks.py:208-302)
with a TPU-native set:

  * :func:`flash_attention` — Pallas online-softmax forward. The KV sequence
    is a GRID axis (minor-most), so each program holds only one
    (block_q, D) query tile and one (block_k, D) KV tile in VMEM with
    f32 running max/denominator/accumulator in VMEM scratch carried across
    KV steps — VMEM use is O(block_q*D + block_k*D), independent of N, so
    dense-mode sequences of tens of thousands of tokens fit. Optionally
    returns the per-query logsumexp for sequence-parallel combination.
  * :func:`_flash_bwd_dq_kernel` / :func:`_flash_bwd_dkv_kernel` — Pallas
    backward: dq streams KV blocks, dk/dv streams Q blocks; both use the
    saved output + logsumexp (no (N, N) materialization, no softmax
    recomputation in XLA).
  * :func:`mha_reference` — plain XLA einsum+softmax (f32 accumulation),
    used on CPU and as the correctness oracle in tests.

All take (B, H, N, D) and return (B, H, N, D), preserving input dtype.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Block sweep on v5e (slope-measured via tools/kernel_tune.py, round-3
# fetch-timed): the best q block is LENGTH-DEPENDENT — at the flagship
# N=1536, bq=512 wins (0.55-0.58 ms vs 0.63 for whole-sequence; the 512-row
# q tile pipelines against the single KV pass better), while at dense-mode
# N=8192 whole-1536 q blocks win (8.64 ms / 95 TF/s vs 10.06 for bq=512;
# fewer KV re-streams). DEFAULT_BLOCK_Q is the short-sequence choice;
# _default_block_q switches at 2048. The single-pass softmax
# specialization applies whenever num_kb == 1.
# takes the single-pass softmax specialization (no online-softmax carry) and
# amortizes program overhead; the (block_q, block_k) f32 score tile (9.4 MB)
# plus q/k/v/acc still fits VMEM. Larger-N inputs stream KV in 1536-row
# blocks, bounding VMEM independent of sequence length.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1536


def _default_block_q(n_q: int, requested: int) -> int:
    """Length-dependent q-block default (see sweep notes above); an explicit
    non-default request is honored as-is."""
    if requested == DEFAULT_BLOCK_Q and n_q > 2048:
        return 1536
    return requested
NEG_INF = -1e30


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Reference attention: softmax(q k^T * scale) v with f32 softmax.

    Mirrors the reference's naive fallback (blocks.py:287-294) which also
    upcasts the attention matrix to float32 before softmax.
    """
    out_dtype = q.dtype
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype)


def _pick_block(n: int, requested: int) -> int:
    """Largest LANE-multiple block <= requested that divides round_up(n,
    LANE) — avoids both pad blowup (N=2048 with a 1536 block would pad to
    3072, +50% work) and oversized VMEM tiles. An explicit non-LANE-multiple
    request is rounded DOWN to a LANE multiple first (e.g. 192 -> 128):
    Mosaic rejects non-lane-multiple minor-dim blocks only at real-chip
    compile time, so honoring such a request would pass CPU tests and fail
    on hardware."""
    n_pad = _round_up(n, LANE)
    b = min(requested - requested % LANE or LANE, n_pad)
    while n_pad % b:
        b -= LANE
    return b


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


LOG2_E = 1.4426950408889634  # log2(e)
LN_2 = 0.6931471805599453  # ln(2)


def _flash_fwd_kernel(
    *refs,
    n_valid: int, block_k: int, num_kb: int, masked: bool,
    qk_norm: bool = False, n_valid_d: int = 0, fold: float = 1.0,
    qk_eps: float = 1e-6, with_lse: bool = True, fold_q: bool = False,
):
    """Grid (BH, num_q_blocks, num_kv_blocks), KV minor-most. Scratch carries
    the online-softmax state across KV steps; output written on the last.

    VPU-lean variant: the softmax scale (and log2(e)) is pre-folded into q by
    the wrapper, so the score tile sees no per-element multiply; ``exp2``
    replaces ``exp`` (saves the ln2 multiply inside the exp lowering); the
    padding mask is compiled out when the sequence is block-aligned; and for
    ``num_kb == 1`` the online-softmax carry (init/alpha/scratch round-trip)
    is compiled out entirely — at the flagship N=1536 these together cut the
    per-element VPU chain roughly in half (measured via tools/kernel_tune.py).

    ``qk_norm`` fuses the per-head Llama-RMSNorm on q and k (reference
    blocks.py:231-232) into the kernel: q and k arrive RAW, each row is
    normalized over its first ``n_valid_d`` lanes in f32 (zero padding lanes
    contribute nothing to the sum), the combined learnable weight
    w2 = wq * wk rides lane-wise on k, and scale*log2(e) (``fold``) rides on
    q post-norm. This removes the two full HBM round-trips the unfused XLA
    RMSNorm pass costs (+3.1 ms/step of 30 at the flagship shape, measured
    via tools/attend_anatomy.py); the in-kernel VPU work overlaps the MXU.
    """
    refs = list(refs)
    q_ref, k_ref, v_ref = refs[:3]
    w2_ref = refs[3] if qk_norm else None
    rest = refs[4:] if qk_norm else refs[3:]
    if with_lse:
        o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
        lse_ref = None
    j = pl.program_id(2)
    single = num_kb == 1

    if not single:
        @pl.when(j == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

    # Native-dtype (bf16) MXU matmuls with f32 accumulation: upcasting the
    # inputs to f32 would push the dots onto the 4x-slower f32 MXU path.
    q = q_ref[0]  # (BQ, D)
    kb = k_ref[0]  # (BK, D)
    vb = v_ref[0]
    if qk_norm:
        # Same math as models.layers.RMSNorm (f32, mean over the true head
        # dim) with the softmax scale folded into q and w2 into k.
        qf = q.astype(jnp.float32)
        rq = jax.lax.rsqrt(
            jnp.sum(qf * qf, axis=-1, keepdims=True) / n_valid_d + qk_eps
        )
        q = (qf * (rq * fold)).astype(q.dtype)
        kf = kb.astype(jnp.float32)
        rk = jax.lax.rsqrt(
            jnp.sum(kf * kf, axis=-1, keepdims=True) / n_valid_d + qk_eps
        )
        kb = (kf * rk * w2_ref[:]).astype(kb.dtype)
    elif fold_q:
        # Packed layout: q could not be pre-scaled in HBM (it shares the
        # buffer with k/v), so the scale*log2(e) fold rides here — one VPU
        # multiply on a (BQ, D) tile, amortized over the (BQ, BK) matmul.
        q = (q.astype(jnp.float32) * fold).astype(q.dtype)
    bq = q.shape[0]

    # q already carries scale * log2(e): s is in the base-2 domain.
    s = jax.lax.dot_general(
        q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK) f32
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        s = jnp.where(col < n_valid, s, NEG_INF)

    if single:
        m_new = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m_new)
        l_new = jnp.sum(p, axis=-1, keepdims=True)
        acc_new = jax.lax.dot_general(
            p.astype(vb.dtype), vb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = jnp.maximum(l_new, 1e-30)
        o_ref[0] = (acc_new / l).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = (m_new * LN_2 + jnp.log(l)).astype(jnp.float32)
        return

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(vb.dtype), vb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc_new

    @pl.when(j == num_kb - 1)
    def _emit():
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if with_lse:
            lse_ref[0] = (m_scr[:, :1] * LN_2 + jnp.log(l)).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "return_lse"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    return_lse: bool = False,
    qk_norm_weights=None,
):
    """Pallas flash attention forward (KV-streaming, VMEM-bounded).

    Args:
        q: (B, H, Nq, D); k, v: (B, H, Nk, D). Nq may differ from Nk
           (sequence-parallel query shards attend over full/partial KV).
        scale: softmax scale (typically D**-0.5 on the unpadded D).
        return_lse: also return the per-query logsumexp (B, H, Nq) in f32 —
           the combination state for ring/sharded attention.
        qk_norm_weights: optional (wq, wk) pair of (D,) f32 RMSNorm weights.
           When given, q and k must be RAW (pre-norm); the kernel applies
           the per-head Llama-RMSNorm in-register (see _flash_fwd_kernel).

    Returns:
        (B, H, Nq, D) in the dtype of ``q`` (plus LSE when requested).
    """
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    out_dtype = q.dtype
    qk_norm = qk_norm_weights is not None

    D_pad = _round_up(D, LANE)
    block_q = _pick_block(Nq, _default_block_q(Nq, block_q))
    block_k = _pick_block(Nk, block_k)
    Nq_pad = _round_up(Nq, block_q)
    Nk_pad = _round_up(Nk, block_k)

    def pad(x, n_pad):
        n = x.shape[2]
        x = x.reshape(B * H, n, D)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, D_pad - D)))

    # Fold scale and log2(e) into q once (O(N*D)) so the kernel's (N, N)
    # score tile needs no per-element scaling and can use exp2 directly.
    # With fused qk-norm the fold rides inside the kernel instead (the norm
    # must see raw q; rsqrt-normalization is not scale-invariant at eps).
    qp = pad(q, Nq_pad)
    if not qk_norm:
        qp = qp * jnp.asarray(scale * LOG2_E, out_dtype)
    kp = pad(k, Nk_pad)
    vp = pad(v, Nk_pad)
    num_kb = Nk_pad // block_k

    inputs = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec(
            (1, block_q, D_pad), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_k, D_pad), lambda b, i, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_k, D_pad), lambda b, i, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    if qk_norm:
        wq, wk = qk_norm_weights
        w2 = (wq.astype(jnp.float32) * wk.astype(jnp.float32)).reshape(1, D)
        inputs.append(jnp.pad(w2, ((0, 0), (0, D_pad - D))))
        in_specs.append(
            pl.BlockSpec(
                (1, D_pad), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM
            )
        )

    grid = (B * H, Nq_pad // block_q, num_kb)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel,
            n_valid=Nk,
            block_k=block_k,
            num_kb=num_kb,
            masked=Nk != Nk_pad,
            qk_norm=qk_norm,
            n_valid_d=D,
            fold=scale * LOG2_E,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, block_q, D_pad), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_q, 1), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Nq_pad, D_pad), out_dtype),
            # (BH, N, 1): a trailing singleton keeps the block shape legal
            # ((block_q, 1) with 1 == full dim) under TPU tiling rules.
            jax.ShapeDtypeStruct((B * H, Nq_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),  # running max
            pltpu.VMEM((block_q, LANE), jnp.float32),  # running denominator
            pltpu.VMEM((block_q, D_pad), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(*inputs)
    out = out[:, :Nq, :D].reshape(B, H, Nq, D)
    if return_lse:
        return out, lse[:, :Nq, 0].reshape(B, H, Nq)
    return out


def flash_attention_packed(
    qkv: jax.Array,
    n_heads: int,
    head_dim: int,
    scale: float,
    qk_norm_weights=None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    return_lse: bool = False,
):
    """Flash attention over the PACKED, lane-padded QKV projection output.

    The standard path costs four full HBM copies per layer around the
    kernel: the (B, N, 3, H, D) -> (3, B, H, N, D) transpose of the qkv
    matmul output, explicit 96->128 lane pads of q/k/v, the output D slice,
    and the (B, H, N, D) -> (B, N, H*D) transpose back (~4 ms/step of the
    ~23 ms BETR attend stage at the flagship shape). Here the qkv matmul
    writes (B, N, 3*H*Dp) directly (weights lane-padded with zeros, ~+0.1
    ms/layer of extra MXU work) and the kernel's BlockSpec index maps read
    the q/k/v head tiles straight out of that buffer — zero intermediate
    copies — writing (B, N, H*Dp), which the output projection consumes
    directly with a row-padded kernel.

    Args:
        qkv: (B, N, 3*H*Dp) with Dp = round_up(head_dim, 128), logical
            layout (section, head, lane); padding lanes MUST be zero (zero
            weight columns => zero v lanes => exact math).
        qk_norm_weights: optional (wq, wk) raw (head_dim,) f32 weights;
            per-head RMSNorm fuses in-kernel as in :func:`flash_attention`.

    Returns:
        (B, N, H*Dp) attention output (padding lanes zero); with
        ``return_lse`` also the (B, H, N) f32 logsumexp — the residual the
        training VJP saves so the backward never recomputes a forward.
    """
    B, N, packed = qkv.shape
    H = n_heads
    Dp = _round_up(head_dim, LANE)
    assert packed == 3 * H * Dp, (packed, H, Dp)
    assert N % LANE == 0, f"packed path needs 128-aligned N, got {N}"
    block_q = _pick_block(N, _default_block_q(N, block_q))
    block_k = _pick_block(N, block_k)
    num_qb, num_kb = N // block_q, N // block_k
    qk_norm = qk_norm_weights is not None

    inputs = [qkv, qkv, qkv]
    in_specs = [
        pl.BlockSpec(
            (1, block_q, Dp), lambda g, i, j: (g // H, i, g % H),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_k, Dp), lambda g, i, j: (g // H, j, H + g % H),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, block_k, Dp), lambda g, i, j: (g // H, j, 2 * H + g % H),
            memory_space=pltpu.VMEM,
        ),
    ]
    if qk_norm:
        wq, wk = qk_norm_weights
        w2 = (wq.astype(jnp.float32) * wk.astype(jnp.float32)).reshape(1, head_dim)
        inputs.append(jnp.pad(w2, ((0, 0), (0, Dp - head_dim))))
        in_specs.append(
            pl.BlockSpec((1, Dp), lambda g, i, j: (0, 0), memory_space=pltpu.VMEM)
        )

    out_specs = [
        pl.BlockSpec(
            (1, block_q, Dp), lambda g, i, j: (g // H, i, g % H),
            memory_space=pltpu.VMEM,
        )
    ]
    out_shapes = [jax.ShapeDtypeStruct((B, N, H * Dp), qkv.dtype)]
    if return_lse:
        # The lse rides its own (B*H, N, 1) buffer indexed by the flat grid
        # head index — same trailing-singleton trick as flash_attention.
        out_specs.append(
            pl.BlockSpec(
                (1, block_q, 1), lambda g, i, j: (g, i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(jax.ShapeDtypeStruct((B * H, N, 1), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel,
            n_valid=N,
            block_k=block_k,
            num_kb=num_kb,
            masked=False,
            qk_norm=qk_norm,
            n_valid_d=head_dim,
            fold=scale * LOG2_E,
            with_lse=return_lse,
            fold_q=not qk_norm,
        ),
        grid=(B * H, num_qb, num_kb),
        in_specs=in_specs,
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shapes if return_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    if return_lse:
        out, lse = outs
        return out, lse[:, :, 0].reshape(B, H, N)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def packed_attention_ad(qkv, wq, wk, n_heads, head_dim, scale, interpret=False):
    """Differentiable packed attention with fused qk-RMSNorm.

    Forward = the copy-free packed kernel, emitting the logsumexp as a
    residual. Backward unpacks the saved qkv/out once (O(N*D) copies — the
    same copies the unpacked path pays in its forward) and feeds the saved
    out/lse straight into the flash backward: NO forward recompute.

    Dispatch note: the VJP is kept functional and gradient-tested, but
    after the round-4 honest train A/B (packed 79.96 vs unpacked 77.25
    ms/step at flagship B8/N1536 — the backward's dq/dk/dv repack
    transposes outweigh the forward's copy-free reads) callers gate packed
    to SERVING only (allow_packed=deterministic in models/layers.py);
    training runs the unpacked flash path.
    """
    return flash_attention_packed(
        qkv, n_heads, head_dim, scale, qk_norm_weights=(wq, wk),
        interpret=interpret,
    )


def _packed_ad_fwd(qkv, wq, wk, n_heads, head_dim, scale, interpret=False):
    out, lse = flash_attention_packed(
        qkv, n_heads, head_dim, scale, qk_norm_weights=(wq, wk),
        interpret=interpret, return_lse=True,
    )
    return out, (qkv, wq, wk, out, lse)


def _packed_ad_bwd(n_heads, head_dim, scale, interpret, residuals, g):
    qkv, wq, wk, out, lse = residuals
    B, N, _ = qkv.shape
    H, D = n_heads, head_dim
    Dp = _round_up(D, LANE)
    qkv5 = qkv.reshape(B, N, 3, H, Dp)[..., :D]
    q = jnp.transpose(qkv5[:, :, 0], (0, 2, 1, 3))
    k = jnp.transpose(qkv5[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv5[:, :, 2], (0, 2, 1, 3))
    out_t = jnp.transpose(out.reshape(B, N, H, Dp)[..., :D], (0, 2, 1, 3))
    gt = jnp.transpose(g.reshape(B, N, H, Dp)[..., :D], (0, 2, 1, 3))
    # The kernel normalized q/k in-register; the backward recomputes the
    # cheap O(N*D) normalization in XLA (same trade as _flash_qknorm_bwd)
    # but reuses the saved out/lse for the O(N^2) part.
    qh = rms_norm(q, wq)
    kh = rms_norm(k, wk)
    if N < FLASH_BWD_PALLAS_MIN_SEQ_LEN:
        dqh, dkh, dv = flash_attention_bwd_xla(qh, kh, v, out_t, lse, gt, scale)
    else:
        dqh, dkh, dv = flash_attention_bwd(
            qh, kh, v, out_t, lse, gt, scale, interpret=interpret
        )
    dq, dwq = _rms_norm_bwd(q, wq, dqh)
    dk, dwk = _rms_norm_bwd(k, wk, dkh)
    d = jnp.stack([dq, dk, dv], axis=0)  # (3, B, H, N, D)
    d = jnp.transpose(d, (1, 3, 0, 2, 4))  # (B, N, 3, H, D)
    d = jnp.pad(d, ((0, 0), (0, 0), (0, 0), (0, 0), (0, Dp - D)))
    return d.reshape(B, N, 3 * H * Dp), dwq, dwk


packed_attention_ad.defvjp(_packed_ad_fwd, _packed_ad_bwd)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, scale: float, n_valid_k: int, block_k: int, num_kb: int, masked: bool
):
    """Grid (BH, num_q_blocks, num_kv_blocks): accumulate dq over KV steps.

    dq_i = scale * sum_j ds_ij k_j, ds = p * (dO v^T - delta).

    Like the forward, q arrives pre-scaled by scale*log2(e) and lse pre-scaled
    by log2(e), so the (BQ, BK) tile sees no per-element multiply and uses
    exp2; the KV padding mask is compiled out when the sequence is
    block-aligned.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]  # pre-scaled by scale*log2(e)
    kb = k_ref[0]
    vb = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (BQ, 1), pre-scaled by log2(e)
    delta = delta_ref[0]
    bq = q.shape[0]

    s = jax.lax.dot_general(
        q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        s = jnp.where(col < n_valid_k, s, NEG_INF)
    p = jnp.exp2(s - lse)  # (BQ, BK); rows past n_valid_q are garbage, sliced off
    dp = jax.lax.dot_general(
        do, vb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta)).astype(kb.dtype)
    dq_scr[:] += scale * jax.lax.dot_general(
        ds, kb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == num_kb - 1)
    def _emit():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, n_valid_q: int, block_q: int, num_qb: int, masked: bool
):
    """Grid (BH, num_kv_blocks, num_q_blocks): accumulate dk/dv over Q steps.

    dv_j = sum_i p_ij^T dO_i;  dk_j = scale * sum_i ds_ij^T q_i.

    q arrives pre-scaled by scale*log2(e) and lse by log2(e) (see
    :func:`flash_attention_bwd`), so dst @ q_scaled = (scale*log2e) dst @ q —
    the dk accumulation multiplies by ln(2) instead of scale to compensate,
    and no raw q is needed in VMEM. The padded-query-rows mask is compiled
    out when Nq is block-aligned.
    """
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # (BQ, D), pre-scaled
    kb = k_ref[0]  # (BK, D)
    vb = v_ref[0]
    do = do_ref[0]  # (BQ, D)
    # lse/delta arrive TRANSPOSED as (1, BQ) row vectors (wrapper lays them
    # out (BH, 1, Nq)): broadcasting a row across sublanes is cheap on the
    # VPU, whereas extracting column 0 of a (BQ, 1) block and transposing it
    # in-kernel is a strided cross-sublane shuffle that dominated this
    # kernel's runtime.
    lse = lse_ref[0]  # (1, BQ), pre-scaled by log2(e)
    delta = delta_ref[0]
    bk = kb.shape[0]
    bq = q.shape[0]

    # s^T directly: (BK, BQ), already in the base-2 domain.
    st = jax.lax.dot_general(
        kb, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pt = jnp.exp2(st - lse)
    if masked:
        # Mask padded query rows so they contribute nothing to dk/dv.
        qcol = jax.lax.broadcasted_iota(jnp.int32, (bk, bq), 1) + i * block_q
        pt = jnp.where(qcol < n_valid_q, pt, 0.0)
    dv_scr[:] += jax.lax.dot_general(
        pt.astype(do.dtype), do, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dpt = jax.lax.dot_general(
        vb, do, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, BQ)
    dst = (pt * (dpt - delta)).astype(q.dtype)
    # scale * dst @ q_raw == ln(2) * dst @ q_scaled
    dk_scr[:] += LN_2 * jax.lax.dot_general(
        dst, q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == num_qb - 1)
    def _emit():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_q", "block_k", "interpret",
        "dq_blocks", "dkv_blocks",
    ),
)
def flash_attention_bwd(
    q, k, v, out, lse, g,
    scale: float,
    block_q: int = 1536,
    block_k: int = 1536,
    interpret: bool = False,
    dq_blocks: "tuple[int, int] | None" = None,
    dkv_blocks: "tuple[int, int] | None" = None,
):
    """Pallas flash backward: (dq, dk, dv) without materializing (N, N).

    Args:
        q, k, v: (B, H, N, D) saved inputs. out: saved forward output.
        lse: (B, H, N) saved logsumexp. g: (B, H, N, D) output cotangent.
        dq_blocks / dkv_blocks: optional per-kernel (block_q, block_k)
            overrides. The dq and dk/dv dispatches have different scratch
            footprints, so their sweet spots differ; explicit values bypass
            the conservative 1024 cap (callers own the VMEM risk — sweep
            with tools/bwd_tune.py --blocks on the real chip first).
    """
    B, H, Nq, D = q.shape
    Nk = k.shape[2]

    D_pad = _round_up(D, LANE)
    # Default blocks (round-5 sweep, tools/bwd_tune.py --blocks, v5e,
    # B8/H8/D96/N1536 fetch-timed chain slopes): each kernel keeps its
    # OUTPUT extent as one full block (dq: q-side; dkv: k-side — one scratch
    # emission, no output re-reads) and streams the reduced operand in 768
    # chunks. Measured 2.21 ms/fwd+bwd vs 2.75 for the old symmetric
    # 1024 cap and 3.19 for symmetric 768; symmetric 1536 blocks still OOM
    # scoped VMEM (17.09 MB) inside lax loops. The 1536/768 caps bound VMEM
    # (~10 MB tiles) at ANY sequence length.
    if dq_blocks is not None:
        bq_dq = _pick_block(Nq, dq_blocks[0])
        bk_dq = _pick_block(Nk, dq_blocks[1])
    else:
        bq_dq = _pick_block(Nq, min(block_q, 1536))
        bk_dq = _pick_block(Nk, min(block_k, 768))
    if dkv_blocks is not None:
        bq_dkv = _pick_block(Nq, dkv_blocks[0])
        bk_dkv = _pick_block(Nk, dkv_blocks[1])
    else:
        bq_dkv = _pick_block(Nq, min(block_q, 768))
        bk_dkv = _pick_block(Nk, min(block_k, 1536))
    # Padded extents must agree across the two dispatches (shared operands).
    block_q = max(bq_dq, bq_dkv)
    block_k = max(bk_dq, bk_dkv)
    Nq_pad = _round_up(Nq, block_q)
    Nk_pad = _round_up(Nk, block_k)
    assert Nq_pad % bq_dq == 0 and Nk_pad % bk_dq == 0
    assert Nq_pad % bq_dkv == 0 and Nk_pad % bk_dkv == 0

    # delta_i = dO_i . O_i (f32), O(N*D) in XLA.
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (B, H, Nq)

    def pad3(x, n_pad):
        n = x.shape[2]
        x = x.reshape(B * H, n, D)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, D_pad - D)))

    def pad2(x, n_pad):
        x = x.reshape(B * H, x.shape[2], 1)
        return jnp.pad(x, ((0, 0), (0, n_pad - x.shape[1]), (0, 0)))

    def pad_row(x, n_pad):
        # (B, H, N) -> (B*H, 1, N_pad): row-vector layout for the dkv kernel.
        x = x.reshape(B * H, 1, x.shape[2])
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - x.shape[2])))

    # Same base-2 trick as the forward: q carries scale*log2(e), lse carries
    # log2(e); the kernels' (BQ, BK) tiles then do a bare exp2(s - lse).
    qp = pad3(q, Nq_pad) * jnp.asarray(scale * LOG2_E, q.dtype)
    kp, vp = pad3(k, Nk_pad), pad3(v, Nk_pad)
    gp = pad3(g, Nq_pad)
    lse2 = lse * LOG2_E
    lsep = pad2(lse2, Nq_pad)
    deltap = pad2(delta, Nq_pad)
    lserow = pad_row(lse2, Nq_pad)
    deltarow = pad_row(delta, Nq_pad)

    q_spec_i = pl.BlockSpec(
        (1, bq_dq, D_pad), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec_j = pl.BlockSpec(
        (1, bk_dq, D_pad), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    row_spec_i = pl.BlockSpec(
        (1, bq_dq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel,
            scale=scale, n_valid_k=Nk, block_k=bk_dq,
            num_kb=Nk_pad // bk_dq, masked=Nk != Nk_pad,
        ),
        grid=(B * H, Nq_pad // bq_dq, Nk_pad // bk_dq),
        in_specs=[q_spec_i, kv_spec_j, kv_spec_j, q_spec_i, row_spec_i, row_spec_i],
        out_specs=q_spec_i,
        out_shape=jax.ShapeDtypeStruct((B * H, Nq_pad, D_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq_dq, D_pad), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, gp, lsep, deltap)

    # dk/dv: grid iterates Q blocks minor-most for each KV block.
    q_spec_i2 = pl.BlockSpec(
        (1, bq_dkv, D_pad), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_spec_j2 = pl.BlockSpec(
        (1, bk_dkv, D_pad), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM
    )
    row_spec_i2 = pl.BlockSpec(
        (1, 1, bq_dkv), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            n_valid_q=Nq, block_q=bq_dkv, num_qb=Nq_pad // bq_dkv,
            masked=Nq != Nq_pad,
        ),
        grid=(B * H, Nk_pad // bk_dkv, Nq_pad // bq_dkv),
        in_specs=[
            q_spec_i2, kv_spec_j2, kv_spec_j2, q_spec_i2, row_spec_i2, row_spec_i2
        ],
        out_specs=[kv_spec_j2, kv_spec_j2],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Nk_pad, D_pad), k.dtype),
            jax.ShapeDtypeStruct((B * H, Nk_pad, D_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk_dkv, D_pad), jnp.float32),
            pltpu.VMEM((bk_dkv, D_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, lserow, deltarow)

    dq = dq[:, :Nq, :D].reshape(B, H, Nq, D)
    dk = dk[:, :Nk, :D].reshape(B, H, Nk, D)
    dv = dv[:, :Nk, :D].reshape(B, H, Nk, D)
    return dq, dk, dv


def flash_attention_bwd_xla(q, k, v, out, lse, g, scale: float):
    """XLA backward from the saved logsumexp: materializes the (N, N) score
    matrix twice but fuses everything else. Slope-measured on v5e at the
    flagship N=1536 this beats the Pallas backward (XLA's fused recompute is
    HBM-bound but short sequences fit comfortably), while at dense-mode
    lengths the O(N^2) HBM traffic collapses — hence the length dispatch in
    :func:`_flash_ad_bwd`.
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse[..., None])  # (B, H, Nq, Nk) f32
    dv = jnp.einsum(
        "bhqk,bhqd->bhkd", p.astype(g.dtype), g,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", g, v, preferred_element_type=jnp.float32
    )
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = (scale * jnp.einsum(
        "bhqk,bhkd->bhqd", ds, k, preferred_element_type=jnp.float32
    )).astype(q.dtype)
    dk = (scale * jnp.einsum(
        "bhqk,bhqd->bhkd", ds, q, preferred_element_type=jnp.float32
    )).astype(k.dtype)
    return dq, dk, dv


# Backward crossover (v5e, re-measured round 3 with honest fetch-timed
# slopes + VMEM-safe 1024-cap blocks, tools/bwd_tune.py, B=8/H=8/D=96):
# the exp2/fold-treated Pallas backward beats the XLA-lse backward at every
# measured length — N=1536: 2.75 vs 4.95 ms/fwd+bwd; N=2048: 4.53 vs 8.49;
# N=3072: 9.75 vs XLA scoped-VMEM compile failure. (The previous 2048
# crossover came from block_until_ready timings the tunnel acks early and
# 1536-block VMEM pressure.) XLA remains for short sequences where kernel
# grid overhead dominates.
FLASH_BWD_PALLAS_MIN_SEQ_LEN = 1024


# ---------------------------------------------------------------------------
# per-head RMSNorm (qk-norm) helpers — XLA twins of the kernel-fused math
# ---------------------------------------------------------------------------

QK_NORM_EPS = 1e-6  # reference LlamaRMSNorm default (blocks.py:231-232)


def rms_norm(x: jax.Array, w: jax.Array, eps: float = QK_NORM_EPS) -> jax.Array:
    """Llama-RMSNorm over the last axis in f32, output in x.dtype — the
    same math models.layers.RMSNorm applies and _flash_fwd_kernel fuses."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _rms_norm_bwd(x, w, dy, eps: float = QK_NORM_EPS):
    """VJP of :func:`rms_norm` wrt (x, w), computed in f32.

    y = w * x * r with r = rsqrt(mean(x^2) + eps):
      dx = r * (w*dy) - r^3 * x * mean((w*dy) * x)
      dw = sum over rows of dy * x * r
    """
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    dyw = dyf * w
    dx = r * dyw - (r**3) * xf * jnp.mean(dyw * xf, axis=-1, keepdims=True)
    dw = jnp.sum(
        (dyf * xf * r).reshape(-1, x.shape[-1]), axis=0, dtype=jnp.float32
    )
    return dx.astype(x.dtype), dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention_qknorm_ad(q, k, v, wq, wk, scale, interpret=False):
    """Flash attention with the per-head qk-RMSNorm fused into the forward
    kernel; the backward recomputes the (cheap, O(N*D)) normalization in XLA
    and reuses the plain flash backward on the normalized tensors."""
    return flash_attention(
        q, k, v, scale, interpret=interpret, qk_norm_weights=(wq, wk)
    )


def _flash_qknorm_fwd(q, k, v, wq, wk, scale, interpret=False):
    out, lse = flash_attention(
        q, k, v, scale, interpret=interpret, return_lse=True,
        qk_norm_weights=(wq, wk),
    )
    return out, (q, k, v, wq, wk, out, lse)


def _flash_qknorm_bwd(scale, interpret, residuals, g):
    q, k, v, wq, wk, out, lse = residuals
    qh = rms_norm(q, wq)
    kh = rms_norm(k, wk)
    if max(q.shape[2], k.shape[2]) < FLASH_BWD_PALLAS_MIN_SEQ_LEN:
        dqh, dkh, dv = flash_attention_bwd_xla(qh, kh, v, out, lse, g, scale)
    else:
        dqh, dkh, dv = flash_attention_bwd(
            qh, kh, v, out, lse, g, scale, interpret=interpret
        )
    dq, dwq = _rms_norm_bwd(q, wq, dqh)
    dk, dwk = _rms_norm_bwd(k, wk, dkh)
    return dq, dk, dv, dwq, dwk


_flash_attention_qknorm_ad.defvjp(_flash_qknorm_fwd, _flash_qknorm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_ad(q, k, v, scale, interpret=False):
    return flash_attention(q, k, v, scale, interpret=interpret)


def _flash_ad_fwd(q, k, v, scale, interpret=False):
    out, lse = flash_attention(q, k, v, scale, interpret=interpret, return_lse=True)
    return out, (q, k, v, out, lse)


def _flash_ad_bwd(scale, interpret, residuals, g):
    q, k, v, out, lse = residuals
    if max(q.shape[2], k.shape[2]) < FLASH_BWD_PALLAS_MIN_SEQ_LEN:
        return flash_attention_bwd_xla(q, k, v, out, lse, g, scale)
    return flash_attention_bwd(q, k, v, out, lse, g, scale, interpret=interpret)


_flash_attention_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


def flash_attention_ad(q, k, v, scale, interpret=False):
    """Differentiable flash attention (Pallas forward AND backward)."""
    return _flash_attention_ad(q, k, v, scale, interpret)


# ---------------------------------------------------------------------------
# short-sequence multi-head kernel (encoder shapes: N ~ 261, D = 64)
# ---------------------------------------------------------------------------


def _mha_multihead_kernel(
    *refs, n_heads: int, n_valid: int, masked: bool, with_lse: bool
):
    """All heads of ONE batch element per grid step.

    Why this exists: at DINOv2's shape (N=261, D=64) the flash kernel loses
    to XLA because its (batch*head,) grid pays per-step overhead on tiny
    blocks and the D=64->128 lane pad doubles its work
    (tools/enc_attn_ab.py, round 4: 3.66 vs 2.78 ms/step at B=8). Here the
    grid is (B,) and the ENTIRE (H, N, D) head stack lives in one VMEM
    block (~4.7 MB at ViT-B geometry), so per-step overhead is amortized
    over 12 heads and the softmax never touches HBM. q arrives pre-folded
    with scale*log2(e) (same base-2 trick as the flash kernel).
    """
    if with_lse:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    for h in range(n_heads):
        qh = q_ref[0, h]  # (N_pad, D_pad)
        kh = k_ref[0, h]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N_pad, N_pad)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = (o / denom).astype(o_ref.dtype)
        if with_lse:
            # natural-log lse from the base-2 stream (for the XLA backward).
            lse_ref[0, h] = (m + jnp.log2(denom)) * LN_2


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret", "return_lse")
)
def mha_multihead(
    q, k, v, scale: float, interpret: bool = False, return_lse: bool = False
):
    """Short-sequence attention, one batch element (all heads) per grid
    step. Whole-N blocks — intended for N up to ~512; no qk-norm variant
    (the encoder has none)."""
    B, H, N, D = q.shape
    D_pad = _round_up(D, LANE)
    N_pad = _round_up(N, LANE)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, N_pad - N), (0, D_pad - D)))

    qp = pad(q) * jnp.asarray(scale * LOG2_E, q.dtype)
    kp, vp = pad(k), pad(v)
    spec = pl.BlockSpec(
        (1, H, N_pad, D_pad), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, H, N_pad, 1), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [spec, lse_spec] if return_lse else spec
    out_shapes = [
        jax.ShapeDtypeStruct((B, H, N_pad, D_pad), q.dtype),
        jax.ShapeDtypeStruct((B, H, N_pad, 1), jnp.float32),
    ]
    outs = pl.pallas_call(
        functools.partial(
            _mha_multihead_kernel,
            n_heads=H, n_valid=N, masked=N != N_pad, with_lse=return_lse,
        ),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=out_specs,
        out_shape=out_shapes if return_lse else out_shapes[0],
        interpret=interpret,
    )(qp, kp, vp)
    if return_lse:
        out, lse = outs
        return out[..., :N, :D], lse[..., :N, 0]
    return outs[..., :N, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha_multihead_ad(q, k, v, scale, interpret=False):
    return mha_multihead(q, k, v, scale, interpret=interpret)


def _mha_multihead_ad_fwd(q, k, v, scale, interpret=False):
    out, lse = mha_multihead(
        q, k, v, scale, interpret=interpret, return_lse=True
    )
    return out, (q, k, v, out, lse)


def _mha_multihead_ad_bwd(scale, interpret, residuals, g):
    # Short sequences: the XLA lse backward is the measured winner (the
    # same dispatch rule as _flash_ad_bwd below the crossover). The
    # flagship path never reaches this — the encoder is frozen.
    q, k, v, out, lse = residuals
    return flash_attention_bwd_xla(q, k, v, out, lse, g, scale)


_mha_multihead_ad.defvjp(_mha_multihead_ad_fwd, _mha_multihead_ad_bwd)


# Short-sequence multi-head dispatch gate: B*H threshold above which
# mha_multihead beats XLA's materialized-scores path on chip. None disables
# (measured round 5 with tools/enc_attn_ab.py at B in {8, 48}; see value).
MHA_MULTIHEAD_MIN_BH: "int | None" = None
MHA_MULTIHEAD_MAX_SEQ_LEN = 512


# Dispatch crossover, measured honestly on v5e (chained lax.scan slope,
# tools/kernel_tune.py): at N=1536/B=8/H=8/D=96 the single-pass exp2 flash
# kernel (whole-sequence q block, exp2/scale folding) runs 0.49 ms vs
# XLA einsum+softmax 1.75 ms (HBM-bound on the f32 (N, N) materialization);
# at DINOv2's N=261 XLA wins (grid overhead dominates).
FLASH_MIN_SEQ_LEN = 1024

# Sequence-parallel context (set by models/dense.py for very large reference
# DBs): when a mesh is installed here, multi_head_attention shards the token
# axis over it with ring attention instead of running one-device flash.
_SP_STATE: dict = {"mesh": None, "axis": "data", "min_len": 4096}


@contextlib.contextmanager
def sequence_parallel_scope(mesh, axis: str = "data", min_len: int = 4096):
    """Route eligible attention calls inside the scope through
    :func:`sequence_parallel_attention` over ``mesh[axis]``.

    Eligible = self-attention (q is k is v not required — shapes equal),
    token count >= ``min_len`` and divisible by the axis size. The decision
    is made at trace time (static shapes), so this composes with jit.
    Differentiable: the ring path has a custom VJP (backward ring with
    traveling dk/dv accumulators), so sequence-parallel TRAINING works.
    """
    prev = dict(_SP_STATE)
    _SP_STATE.update(mesh=mesh, axis=axis, min_len=min_len)
    try:
        yield
    finally:
        _SP_STATE.update(prev)


def packed_attention_eligible(n_tokens: int, qk_norm: bool) -> bool:
    """True when the copy-free packed-layout kernel should serve this shape:
    TPU backend, flash-length 128-aligned sequence, fused qk-norm weights
    available (the AD wrapper needs them), and no sequence-parallel scope
    (the ring path owns long sequences there)."""
    return (
        qk_norm
        and jax.default_backend() == "tpu"
        and n_tokens > FLASH_MIN_SEQ_LEN
        and n_tokens % LANE == 0
        and _SP_STATE["mesh"] is None
    )


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    qk_norm_weights=None,
) -> jax.Array:
    """Backend dispatch: on TPU, XLA fused attention for short sequences and
    the Pallas flash kernel (Pallas forward + Pallas backward) beyond
    FLASH_MIN_SEQ_LEN; XLA reference elsewhere. Inside a
    :func:`sequence_parallel_scope`, long sequences ride the ring instead.

    ``qk_norm_weights=(wq, wk)`` applies the per-head Llama-RMSNorm to raw
    q/k — fused into the Pallas forward on the flash path, as a plain XLA
    pass on the others (numerically the same math either way)."""
    mesh = _SP_STATE["mesh"]
    if mesh is not None:
        n_tok = q.shape[-2]
        n_shards = mesh.shape[_SP_STATE["axis"]]
        if (
            n_tok >= _SP_STATE["min_len"]
            and n_tok % n_shards == 0
            # Ring attention is self-attention only: k/v must shard the same
            # token axis as q. A cross-attention call inside the scope falls
            # through to the regular backends.
            and q.shape == k.shape
        ):
            if qk_norm_weights is not None:
                q = rms_norm(q, qk_norm_weights[0])
                k = rms_norm(k, qk_norm_weights[1])
            return sequence_parallel_attention(
                q, k, v, scale, mesh, axis=_SP_STATE["axis"]
            )
    platform = jax.default_backend()
    # max(Nq, Nk): a short query shard over a long KV (the serving path's
    # query-sliced final layer) is exactly where flash's no-(N,N)
    # materialization matters.
    if platform == "tpu" and max(q.shape[-2], k.shape[-2]) > FLASH_MIN_SEQ_LEN:
        if qk_norm_weights is not None:
            return _flash_attention_qknorm_ad(
                q, k, v, qk_norm_weights[0], qk_norm_weights[1], scale, False
            )
        return _flash_attention_ad(q, k, v, scale, False)
    if qk_norm_weights is not None:
        q = rms_norm(q, qk_norm_weights[0])
        k = rms_norm(k, qk_norm_weights[1])
    if (
        platform == "tpu"
        and MHA_MULTIHEAD_MIN_BH is not None
        and q.ndim == 4
        and q.shape == k.shape == v.shape
        and q.shape[-2] <= MHA_MULTIHEAD_MAX_SEQ_LEN
        and q.shape[0] * q.shape[1] >= MHA_MULTIHEAD_MIN_BH
    ):
        # Encoder-shape fast path (short N, many batch*head programs):
        # whole-stack-per-step kernel, gated by the measured threshold.
        return _mha_multihead_ad(q, k, v, scale, False)
    return mha_reference(q, k, v, scale)


# ---------------------------------------------------------------------------
# sequence-parallel (ring) attention over a mesh axis
# ---------------------------------------------------------------------------


def _attn_with_lse(q, k, v, scale, use_flash, interpret, block_q, block_k):
    if use_flash:
        return flash_attention(
            q, k, v, scale,
            block_q=block_q, block_k=block_k,
            interpret=interpret, return_lse=True,
        )
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        jax.nn.softmax(s, axis=-1).astype(q.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out, lse


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    mesh,
    axis: str = "data",
    use_flash: bool | None = None,
    interpret: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Ring attention: tokens sharded over a mesh axis, KV shards rotated
    around the ring with ``lax.ppermute``, partial results combined exactly
    via logsumexp reweighting (SURVEY.md §2.5's forward-looking requirement —
    dense-reference eval with token counts beyond one chip's HBM/VMEM).

    Each of the P devices holds (B, H, N/P, D) of q/k/v; peak memory per
    device is O(N/P) and the (N, N) score matrix never exists. Inside the
    ring the local compute is the Pallas flash kernel (TPU) or the XLA
    reference (CPU tests).

    Differentiable: a custom VJP runs the backward ring — each device
    accumulates dq for its query shard while dk/dv partial sums travel with
    their KV shard (same ppermute schedule), arriving home after a full
    rotation. Gradients bit-match the single-device reference
    (tests/parallel/test_seq_parallel.py).

    Args:
        q, k, v: (B, H, N, D) global arrays (sharded or to-be-sharded);
            N must divide by the size of ``axis``.
        mesh: jax.sharding.Mesh containing ``axis``.
        use_flash: force the kernel choice; default = flash on TPU.

    Returns:
        (B, H, N, D), sharded over ``axis`` on the token dim.
    """
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    assert q.shape[2] % mesh.shape[axis] == 0, (q.shape, mesh.shape[axis])
    return _ring_attention_ad(
        q, k, v, scale, mesh, axis, use_flash, interpret, block_q, block_k
    )


def _ring_fwd_local(q_l, k_l, v_l, *, scale, axis, n_shards, use_flash,
                    interpret, block_q, block_k):
    """Per-device forward ring; returns (o, global lse) for the local
    query shard."""
    o, lse = _attn_with_lse(
        q_l, k_l, v_l, scale, use_flash, interpret, block_q, block_k
    )
    o = o.astype(jnp.float32)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    # o tracks the normalized-so-far output; each ring step does a
    # numerically stable pairwise logsumexp combine with the new shard.
    def body(_, carry):
        o, lse, k_c, v_c = carry
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        o_i, lse_i = _attn_with_lse(
            q_l, k_c, v_c, scale, use_flash, interpret, block_q, block_k
        )
        m = jnp.maximum(lse, lse_i)
        w0 = jnp.exp(lse - m)
        w1 = jnp.exp(lse_i - m)
        denom = w0 + w1
        o = (
            o * (w0 / denom)[..., None]
            + o_i.astype(jnp.float32) * (w1 / denom)[..., None]
        )
        lse = m + jnp.log(denom)
        return o, lse, k_c, v_c

    o, lse, _, _ = jax.lax.fori_loop(1, n_shards, body, (o, lse, k_l, v_l))
    return o.astype(q_l.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _ring_attention_ad(q, k, v, scale, mesh, axis, use_flash, interpret,
                       block_q, block_k):
    out, _ = _ring_fwd_sharded(
        q, k, v, scale, mesh, axis, use_flash, interpret, block_q, block_k
    )
    return out


def _ring_fwd_sharded(q, k, v, scale, mesh, axis, use_flash, interpret,
                      block_q, block_k):
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis]
    local = functools.partial(
        _ring_fwd_local, scale=scale, axis=axis, n_shards=n_shards,
        use_flash=use_flash, interpret=interpret,
        block_q=block_q, block_k=block_k,
    )
    spec = P(None, None, axis, None)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info.
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P(None, None, axis)),
        check_vma=False,
    )(q, k, v)


def _ring_ad_fwd(q, k, v, scale, mesh, axis, use_flash, interpret,
                 block_q, block_k):
    out, lse = _ring_fwd_sharded(
        q, k, v, scale, mesh, axis, use_flash, interpret, block_q, block_k
    )
    return out, (q, k, v, out, lse)


def _ring_ad_bwd(scale, mesh, axis, use_flash, interpret, block_q, block_k,
                 residuals, g):
    from jax.sharding import PartitionSpec as P

    q, k, v, out, lse = residuals
    n_shards = mesh.shape[axis]

    def bwd_partial(q_l, k_c, v_c, o_l, lse_l, g_l):
        """Gradients of the GLOBAL softmax restricted to one KV shard:
        p_ij = exp(s_ij - lse_i) with the global lse, delta from the global
        out — exactly what the flash backward computes when fed the combined
        out/lse with the shard's k/v."""
        if use_flash and max(
            q_l.shape[2], k_c.shape[2]
        ) >= FLASH_BWD_PALLAS_MIN_SEQ_LEN:
            return flash_attention_bwd(
                q_l, k_c, v_c, o_l, lse_l, g_l, scale, interpret=interpret
            )
        return flash_attention_bwd_xla(q_l, k_c, v_c, o_l, lse_l, g_l, scale)

    def local(q_l, k_l, v_l, o_l, lse_l, g_l):
        perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
        dq = jnp.zeros(q_l.shape, jnp.float32)
        dk_acc = jnp.zeros(k_l.shape, jnp.float32)
        dv_acc = jnp.zeros(v_l.shape, jnp.float32)

        def body(_, carry):
            dq, dk_acc, dv_acc, k_c, v_c = carry
            dq_p, dk_p, dv_p = bwd_partial(q_l, k_c, v_c, o_l, lse_l, g_l)
            dq = dq + dq_p.astype(jnp.float32)
            dk_acc = dk_acc + dk_p.astype(jnp.float32)
            dv_acc = dv_acc + dv_p.astype(jnp.float32)
            # dk/dv partial sums travel WITH their kv shard: after the full
            # n_shards rotations every accumulator is back on the device
            # that owns its shard.
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            dk_acc = jax.lax.ppermute(dk_acc, axis, perm)
            dv_acc = jax.lax.ppermute(dv_acc, axis, perm)
            return dq, dk_acc, dv_acc, k_c, v_c

        dq, dk_acc, dv_acc, _, _ = jax.lax.fori_loop(
            0, n_shards, body, (dq, dk_acc, dv_acc, k_l, v_l)
        )
        return (
            dq.astype(q_l.dtype),
            dk_acc.astype(k_l.dtype),
            dv_acc.astype(v_l.dtype),
        )

    spec = P(None, None, axis, None)
    lspec = P(None, None, axis)
    dq, dk, dv = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, lspec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )(q, k, v, out, lse, g)
    return dq, dk, dv


_ring_attention_ad.defvjp(_ring_ad_fwd, _ring_ad_bwd)

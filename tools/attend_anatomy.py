"""Decompose the BETR attend-program cost on the real chip.

The serving profile (tools/stage_profile.py) shows the 12-layer attend stage
dominating (~30 ms/step at batch 8); its matmul-ideal is ~11 ms and the flash
kernel ~6 ms, leaving ~12 ms of unexplained slack. This tool measures chain
slopes of successively richer variants of the SAME stack geometry to localize
the slack:

    matmul : qkv + proj + mlp matmuls only (no LN, no attention, no gelu)
    mlp    : + exact gelu
    ln     : + the two pre-LNs and residuals
    attn   : + flash attention between qkv and proj (lane-padded layout)
    qknorm : + per-head RMSNorm on q/k (the full block, lane-padded)
    plain  : the full block WITHOUT lane padding (pad/unpad copies back)

Each variant is a 12-layer stack at the flagship shape (B=8, T*P=1536,
d=768, H=8) in bf16, timed as the slope between K- and 2K-step lax.scan
chains (dispatch overhead and remote-dedup artifacts cancel; see bench.py).

Usage: python tools/attend_anatomy.py [--batch 8] [--k 8] [--variants ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from boxdreamer_tpu.models import layers
from boxdreamer_tpu.models.layers import gelu_bf16_fast
from boxdreamer_tpu.ops.attention import (flash_attention_packed,
                                          multi_head_attention)

D_MODEL = 768
HEADS = 8
LAYERS = 12
SEQ = 1536
MLP_HIDDEN = int(D_MODEL * 4.0)


def init_params(key):
    """One layer's worth of weights, shared across layers (timing only)."""
    ks = jax.random.split(key, 6)
    s = lambda *sh: jax.random.normal(ks[0], sh, jnp.bfloat16) * 0.02
    return {
        "qkv_w": jax.random.normal(ks[0], (D_MODEL, 3 * D_MODEL), jnp.bfloat16) * 0.02,
        "qkv_b": jnp.zeros((3 * D_MODEL,), jnp.bfloat16),
        "proj_w": jax.random.normal(ks[1], (D_MODEL, D_MODEL), jnp.bfloat16) * 0.02,
        "proj_b": jnp.zeros((D_MODEL,), jnp.bfloat16),
        "fc1_w": jax.random.normal(ks[2], (D_MODEL, MLP_HIDDEN), jnp.bfloat16) * 0.02,
        "fc1_b": jnp.zeros((MLP_HIDDEN,), jnp.bfloat16),
        "fc2_w": jax.random.normal(ks[3], (MLP_HIDDEN, D_MODEL), jnp.bfloat16) * 0.02,
        "fc2_b": jnp.zeros((D_MODEL,), jnp.bfloat16),
        "ln1_s": jnp.ones((D_MODEL,), jnp.float32),
        "ln2_s": jnp.ones((D_MODEL,), jnp.float32),
        "qn_w": jnp.ones((D_MODEL // HEADS,), jnp.float32),
        "kn_w": jnp.ones((D_MODEL // HEADS,), jnp.float32),
    }


def _ln(x, scale):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale).astype(x.dtype)


def _rms(x, w, n_valid):
    xf = x.astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / n_valid
    out = xf * jax.lax.rsqrt(var + 1e-6)
    if w.shape[-1] != x.shape[-1]:
        w = jnp.pad(w, (0, x.shape[-1] - w.shape[-1]))
    return (out * w).astype(x.dtype)


def block(p, x, *, gelu, ln, attn, qknorm, lane_pad):
    B, N, C = x.shape
    D = C // HEADS
    h = _ln(x, p["ln1_s"]) if ln else x
    if qknorm == "fusedall":
        # Round-3 production path: LN1 fused into the packed qkv matmul,
        # residual+LN2 fused into fc1, gelu fused into fc2.
        from boxdreamer_tpu.ops import fused_matmul as FM

        Dp = 128
        kw = jnp.pad(
            p["qkv_w"].reshape(C, 3, HEADS, D), ((0, 0),) * 3 + ((0, Dp - D),)
        ).reshape(C, 3 * HEADS * Dp)
        kb = jnp.pad(
            p["qkv_b"].reshape(3, HEADS, D), ((0, 0), (0, 0), (0, Dp - D))
        ).reshape(-1)
        zeros = jnp.zeros((C,), jnp.float32)
        x2 = x.reshape(B * N, C)
        qkv2, _ = FM.ln_matmul(x2, None, kw, p["ln1_s"], zeros, kb, 1e-5)
        o = flash_attention_packed(
            qkv2.reshape(B, N, 3 * HEADS * Dp), HEADS, D, D**-0.5,
            (p["qn_w"], p["kn_w"]),
        )
        pw = jnp.pad(
            p["proj_w"].reshape(HEADS, D, C), ((0, 0), (0, Dp - D), (0, 0))
        ).reshape(HEADS * Dp, C)
        a = (o.reshape(B * N, HEADS * Dp) @ pw) + p["proj_b"]
        y, t = FM.ln_matmul(
            x2, a, p["fc1_w"], p["ln2_s"], zeros, p["fc1_b"], 1e-5
        )
        m = FM.gelu_matmul(y, p["fc2_w"], p["fc2_b"])
        return (t + m).reshape(B, N, C)
    if qknorm == "packed":
        # Copy-free path: lane-padded packed qkv matmul -> packed kernel
        # (BlockSpec index maps read head tiles in place) -> row-padded proj.
        Dp = 128
        kw = jnp.pad(
            p["qkv_w"].reshape(C, 3, HEADS, D), ((0, 0),) * 3 + ((0, Dp - D),)
        ).reshape(C, 3 * HEADS * Dp)
        kb = jnp.pad(
            p["qkv_b"].reshape(3, HEADS, D), ((0, 0), (0, 0), (0, Dp - D))
        ).reshape(-1)
        qkv = h @ kw + kb
        o = flash_attention_packed(
            qkv, HEADS, D, D**-0.5, (p["qn_w"], p["kn_w"])
        )  # (B, N, H*Dp)
        pw = jnp.pad(
            p["proj_w"].reshape(HEADS, D, C), ((0, 0), (0, Dp - D), (0, 0))
        ).reshape(HEADS * Dp, C)
        a = o @ pw + p["proj_b"]
        x = x + a if ln else a
        h2 = _ln(x, p["ln2_s"]) if ln else x
        m = h2 @ p["fc1_w"] + p["fc1_b"]
        if gelu == "fast":
            m = gelu_bf16_fast(m)
        m = m @ p["fc2_w"] + p["fc2_b"]
        return x + m if ln else m
    if lane_pad and attn:
        Dp = 128
        kw = p["qkv_w"].reshape(C, 3 * HEADS, D)
        kw = jnp.pad(kw, ((0, 0), (0, 0), (0, Dp - D)))
        kb = jnp.pad(p["qkv_b"].reshape(3 * HEADS, D), ((0, 0), (0, Dp - D)))
        qkv = jnp.einsum("bnc,chd->bnhd", h, kw) + kb
        qkv = qkv.reshape(B, N, 3, HEADS, Dp)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        if qknorm:
            q = _rms(q, p["qn_w"], D)
            k = _rms(k, p["kn_w"], D)
        o = multi_head_attention(q, k, v, scale=D**-0.5)
        o = jnp.transpose(o, (0, 2, 1, 3))  # (B, N, H, Dp)
        pw = jnp.pad(
            p["proj_w"].reshape(HEADS, D, C), ((0, 0), (0, Dp - D), (0, 0))
        )
        a = jnp.einsum("bnhd,hdc->bnc", o, pw) + p["proj_b"]
    else:
        qkv = h @ p["qkv_w"] + p["qkv_b"]
        if attn:
            qkv = qkv.reshape(B, N, 3, HEADS, D)
            qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
            q, k, v = qkv[0], qkv[1], qkv[2]
            if qknorm == "fused" or qknorm == "eproj":
                o = multi_head_attention(
                    q, k, v, scale=D**-0.5,
                    qk_norm_weights=(p["qn_w"], p["kn_w"]),
                )
            else:
                if qknorm:
                    q = _rms(q, p["qn_w"], D)
                    k = _rms(k, p["kn_w"], D)
                o = multi_head_attention(q, k, v, scale=D**-0.5)
            if qknorm == "eproj":
                # Contract the (B,H,N,D) kernel output against the per-head
                # proj kernel directly — no explicit transpose copy.
                a = jnp.einsum(
                    "bhnd,hdc->bnc", o, p["proj_w"].reshape(HEADS, D, C)
                ) + p["proj_b"]
                h2 = _ln(x + a, p["ln2_s"]) if ln else a
                m = h2 @ p["fc1_w"] + p["fc1_b"]
                if gelu == "fast":
                    m = gelu_bf16_fast(m)
                m = m @ p["fc2_w"] + p["fc2_b"]
                xr = x + a if ln else a
                return xr + m if ln else m
            o = jnp.transpose(o, (0, 2, 1, 3)).reshape(B, N, C)
        else:
            o = qkv[..., :C]  # matmul-only: take the q slice as "output"
        a = o @ p["proj_w"] + p["proj_b"]
    x = x + a if ln else a
    h = _ln(x, p["ln2_s"]) if ln else x
    m = h @ p["fc1_w"] + p["fc1_b"]
    if gelu == "exact":
        m = jax.nn.gelu(m, approximate=False)
    elif gelu == "tanh":
        m = jax.nn.gelu(m, approximate=True)
    elif gelu == "fast":
        m = gelu_bf16_fast(m)
    m = m @ p["fc2_w"] + p["fc2_b"]
    return x + m if ln else m


VARIANTS = {
    "matmul": dict(gelu="none", ln=False, attn=False, qknorm=False, lane_pad=False),
    "mlp": dict(gelu="exact", ln=False, attn=False, qknorm=False, lane_pad=False),
    "mlp_tanh": dict(gelu="tanh", ln=False, attn=False, qknorm=False, lane_pad=False),
    "mlp_fast": dict(gelu="fast", ln=False, attn=False, qknorm=False, lane_pad=False),
    "ln": dict(gelu="exact", ln=True, attn=False, qknorm=False, lane_pad=False),
    "attn": dict(gelu="exact", ln=True, attn=True, qknorm=False, lane_pad=True),
    "qknorm": dict(gelu="exact", ln=True, attn=True, qknorm=True, lane_pad=True),
    "plain": dict(gelu="exact", ln=True, attn=True, qknorm=True, lane_pad=False),
    # The production block after this round's tuning: fast bf16 GELU,
    # no lane padding, qk-RMSNorm fused into the flash kernel.
    "prod": dict(gelu="fast", ln=True, attn=True, qknorm="fused", lane_pad=False),
    "prod_unfused": dict(
        gelu="fast", ln=True, attn=True, qknorm=True, lane_pad=False
    ),
    # prod + transpose-free output projection (einsum over (B,H,N,D)).
    "prod_eproj": dict(
        gelu="fast", ln=True, attn=True, qknorm="eproj", lane_pad=False
    ),
    # Packed-layout kernel: no qkv transpose, no 96->128 pad copies, no
    # output slice/transpose (round-3 candidate).
    "prod_packed": dict(
        gelu="fast", ln=True, attn=True, qknorm="packed", lane_pad=False
    ),
    # packed + all prologue fusions (LN1->qkv, residual+LN2->fc1, gelu->fc2)
    "prod_fused": dict(
        gelu="fast", ln=True, attn=True, qknorm="fusedall", lane_pad=False
    ),
}


def chain_time(fn, p, batch, k_steps, seed):
    @jax.jit
    def chained(p, x0):
        def body(carry, _):
            x, acc = carry
            y = fn(p, x)
            s = jnp.sum(y.astype(jnp.float32))
            return (x + y * 1e-20, acc + s), jnp.float32(0.0)

        (x, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), None, length=k_steps)
        return acc

    # DISTINCT input per timed dispatch: the remote transport dedupes
    # repeated identical dispatches (CLAUDE.md), which made repeated-args
    # timings collapse to transport RTT (observed: 1.49 "ms/step" for a
    # 12-layer stack whose matmul ideal alone is ~11 ms).
    def make_x(r):
        return jax.random.normal(
            jax.random.PRNGKey(seed * 101 + r), (batch, SEQ, D_MODEL),
            jnp.bfloat16,
        )

    out = jax.device_get(chained(p, make_x(0)))  # compile + warm
    assert jnp.isfinite(out)
    best = float("inf")
    for r in range(1, 4):
        x0 = jax.block_until_ready(make_x(r))
        t0 = time.perf_counter()
        out = jax.device_get(chained(p, x0))
        best = min(best, time.perf_counter() - t0)
        assert jnp.isfinite(out)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    p = init_params(jax.random.PRNGKey(0))
    print(f"attend anatomy (batch {args.batch}, {LAYERS} layers, slope "
          f"{args.k}->{2*args.k}):", flush=True)
    for name in args.variants.split(","):
        flags = VARIANTS[name]

        def stack(p, x, flags=flags):
            for _ in range(LAYERS):
                x = block(p, x, **flags)
            return x

        t1 = chain_time(stack, p, args.batch, args.k, 11)
        t2 = chain_time(stack, p, args.batch, 2 * args.k, 12)
        ms = (t2 - t1) / args.k * 1e3
        print(f"  {name:7s}: {ms:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

"""On-chip Pallas kernel regression gate: compile + numerics.

Compiles every Pallas kernel variant on the real TPU in one run, exiting
nonzero on any Mosaic lowering failure, then (default) EXECUTES each variant
on deterministic inputs and compares against an XLA reference — a kernel
change that compiles but computes the wrong thing fails here, not in a
downstream bench whose checksum only requires finite/nonzero. CI runs the
kernels in interpret mode only, and interpret mode does not enforce TPU
tiling rules (CLAUDE.md) — one bad tiling change could pass the full CPU
suite. bench.py runs this as a preamble so every recorded BENCH_r*.json
implies kernel health.

Variant coverage (ops/attention.py, ops/fused_matmul.py):
  * fwd single-pass (num_kb==1), block-aligned (mask compiled out)
  * fwd masked (Nk % LANE != 0 -> padding mask compiled in)
  * fwd fused qk-RMSNorm (raw q/k + in-kernel norm + fold)
  * fwd multi-KV-block streaming (N > DEFAULT_BLOCK_K)
  * fwd with LSE output (ring-attention local step)
  * packed-layout fwd (plain / qk-norm / flagship / with-LSE residual)
  * bwd dq + dkv kernels, aligned and masked
  * prologue-fused matmuls (gelu_matmul, ln_matmul), bf16 + f32
  * flagship BETR shape end-to-end (what bench.py serves)

Usage: python -m boxdreamer_tpu.tools.chip_check  (runs on the default
platform — the tunneled TPU; pass --interpret for a CPU smoke run;
--compile-only skips the numerics executions).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
import zlib

import jax
import jax.numpy as jnp

from boxdreamer_tpu.ops import attention as attn

# Relative max-error gates. The kernels run bf16 MXU matmuls with f32
# accumulation; against an f32-softmax XLA reference on O(1)-magnitude
# activations the honest error is ~1e-2 — a *wrong* kernel is off by O(1).
TOL_BF16 = 5e-2
TOL_F32 = 5e-2  # f32 dots still round through bf16 on the MXU by default


def _s(*shape, dtype=jnp.bfloat16):
    return jax.ShapeDtypeStruct(shape, dtype)


def _rand(key, spec):
    if jnp.issubdtype(spec.dtype, jnp.floating):
        return jax.random.normal(key, spec.shape, spec.dtype)
    return jnp.zeros(spec.shape, spec.dtype)


def _default_inputs(shapes):
    def make(key):
        keys = jax.random.split(key, len(shapes))
        return [_rand(k, s) for k, s in zip(keys, shapes)]
    return make


def _rel_err(got, want):
    g = jnp.asarray(got, jnp.float32)
    w = jnp.asarray(want, jnp.float32)
    return float(jnp.max(jnp.abs(g - w)) / (jnp.max(jnp.abs(w)) + 1e-6))


def _xla_out_lse(q, k, v, scale):
    """f32 softmax attention + natural-log lse (reference for fwd+bwd)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out, lse


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / jnp.sqrt(2.0)))).astype(x.dtype)


def _ln(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(x.dtype)


def variants(interpret: bool = False):
    """(name, fn, arg_shapes, ref_fn, make_inputs, tol) per kernel variant.

    ``ref_fn`` computes the same math via plain XLA ops on the same inputs
    (None => compile-only variant); ``make_inputs(key)`` builds concrete
    arrays when random normals of ``arg_shapes`` would be inconsistent
    (the backward needs out/lse derived from q/k/v).
    """
    D = 96
    scale = D ** -0.5
    f = functools.partial(attn.flash_attention, scale=scale, interpret=interpret)
    fb = functools.partial(
        attn.flash_attention_bwd, scale=scale, interpret=interpret
    )
    mha = functools.partial(attn.mha_reference, scale=scale)

    def qkv(B, H, N, dtype=jnp.bfloat16):
        return [_s(B, H, N, D, dtype=dtype)] * 3

    out = []

    def add(name, fn, shapes, ref=None, make_inputs=None, tol=TOL_BF16):
        out.append((name, fn, shapes, ref,
                    make_inputs or _default_inputs(shapes), tol))

    # fwd: single-pass, block-aligned (mask compiled out) — small N
    add("fwd single-pass aligned", f, qkv(1, 2, 256), mha)
    # fwd: masked tail (N not a LANE multiple)
    add("fwd masked tail", f, qkv(1, 2, 200), mha)
    # fwd: fused qk-RMSNorm
    add(
        "fwd fused qk-norm",
        lambda q, k, v, wq, wk: attn.flash_attention(
            q, k, v, scale, interpret=interpret, qk_norm_weights=(wq, wk)
        ),
        qkv(1, 2, 256) + [_s(D, dtype=jnp.float32)] * 2,
        lambda q, k, v, wq, wk: mha(
            attn.rms_norm(q, wq), attn.rms_norm(k, wk), v
        ),
    )
    # fwd: multi-KV-block streaming (N > DEFAULT_BLOCK_K=1536)
    add("fwd multi-kv-block N=4096", f, qkv(1, 2, 4096), mha)
    # short-sequence multi-head kernel (encoder shape, D=64, masked tail)
    D64 = 64
    mh_scale = D64 ** -0.5
    add(
        "mha_multihead encoder-shape",
        functools.partial(
            attn.mha_multihead, scale=mh_scale, interpret=interpret
        ),
        [_s(2, 12, 261, D64)] * 3,
        functools.partial(attn.mha_reference, scale=mh_scale),
    )
    add(
        "mha_multihead with lse",
        functools.partial(
            attn.mha_multihead, scale=mh_scale, interpret=interpret,
            return_lse=True,
        ),
        [_s(1, 4, 256, D64)] * 3,
        lambda q, k, v: _xla_out_lse(q, k, v, mh_scale),
    )
    # fwd: LSE output (ring-attention local step)
    add(
        "fwd with lse (ring local)",
        functools.partial(
            attn.flash_attention, scale=scale, interpret=interpret,
            return_lse=True,
        ),
        qkv(1, 2, 512),
        lambda q, k, v: _xla_out_lse(q, k, v, scale),
    )

    # bwd dq+dkv: aligned and masked. Inputs must be self-consistent:
    # out/lse derive from q/k/v, so random normals won't do.
    def bwd_shapes(N):
        return qkv(1, 2, N) + [
            _s(1, 2, N, D),                       # out
            _s(1, 2, N, dtype=jnp.float32),       # lse
            _s(1, 2, N, D),                       # g
        ]

    def bwd_inputs(N):
        def make(key):
            ks = jax.random.split(key, 4)
            q, k, v = (jax.random.normal(kk, (1, 2, N, D), jnp.bfloat16)
                       for kk in ks[:3])
            g = jax.random.normal(ks[3], (1, 2, N, D), jnp.bfloat16)
            o, lse = _xla_out_lse(q, k, v, scale)
            return [q, k, v, o, lse, g]
        return make

    def bwd_ref(q, k, v, o, lse, g):
        return attn.flash_attention_bwd_xla(q, k, v, o, lse, g, scale)

    add("bwd dq/dkv aligned", fb, bwd_shapes(512), bwd_ref,
        bwd_inputs(512))
    add("bwd dq/dkv masked", fb, bwd_shapes(400), bwd_ref,
        bwd_inputs(400))

    # packed-layout kernel (qkv read in place from the projection output)
    def packed_fn(**kw):
        def fn(qkv, *w):
            return attn.flash_attention_packed(
                qkv, 8, D, scale, w or None, interpret=interpret, **kw
            )
        return fn

    Dp = 128

    def packed_inputs(B, N, with_w):
        def make(key):
            ks = jax.random.split(key, 5)
            q, k, v = (jax.random.normal(kk, (B, 8, N, D), jnp.bfloat16)
                       for kk in ks[:3])
            stk = jnp.transpose(jnp.stack([q, k, v], 0), (1, 3, 0, 2, 4))
            packed = jnp.pad(
                stk, ((0, 0),) * 4 + ((0, Dp - D),)
            ).reshape(B, N, 3 * 8 * Dp)
            xs = [packed]
            if with_w:
                xs += [jax.random.uniform(kk, (D,), jnp.float32, 0.5, 1.5)
                       for kk in ks[3:]]
            return xs
        return make

    def packed_ref(with_lse):
        def ref(qkv, *w):
            B, N, _ = qkv.shape
            q5 = qkv.reshape(B, N, 3, 8, Dp)[..., :D]
            q, k, v = (jnp.transpose(q5[:, :, s], (0, 2, 1, 3))
                       for s in range(3))
            if w:
                q, k = attn.rms_norm(q, w[0]), attn.rms_norm(k, w[1])
            o, lse = _xla_out_lse(q, k, v, scale)
            o = jnp.pad(
                jnp.transpose(o, (0, 2, 1, 3)), ((0, 0),) * 3 + ((0, Dp - D),)
            ).reshape(B, N, 8 * Dp)
            return (o, lse) if with_lse else o
        return ref

    add("fwd packed qk-norm", packed_fn(),
        [_s(2, 256, 3 * 8 * 128)] + [_s(D, dtype=jnp.float32)] * 2,
        packed_ref(False), packed_inputs(2, 256, True))
    add("fwd packed plain", packed_fn(), [_s(2, 256, 3 * 8 * 128)],
        packed_ref(False), packed_inputs(2, 256, False))
    add("fwd packed with lse (train residual)", packed_fn(return_lse=True),
        [_s(2, 256, 3 * 8 * 128)] + [_s(D, dtype=jnp.float32)] * 2,
        packed_ref(True), packed_inputs(2, 256, True))
    add("fwd packed flagship B8 N1536", packed_fn(),
        [_s(8, 1536, 3 * 8 * 128)] + [_s(D, dtype=jnp.float32)] * 2,
        packed_ref(False), packed_inputs(8, 1536, True))

    # PACKED + INT8 composition — the actual TPU serving default
    # (models/layers.py Attention quantized packed branch: int8 qkv GEMM
    # over lane-padded kernels -> packed flash kernel -> int8 output
    # projection on the Dp-padded stream). The int8 accuracy proxy
    # (tests/parity/test_int8_accuracy.py) runs on CPU where the packed
    # gate is off, so THIS is the only numerics check of the composition.
    # D=96 like the flagship (the 96->128 pad interplay is the point);
    # tolerance covers two dynamic-int8 GEMMs (~2% each).
    from boxdreamer_tpu.models import layers as _L

    _attn_mod = _L.Attention(num_heads=2, qk_norm=True, dtype=jnp.bfloat16)
    _attn_x0 = jnp.zeros((2, 1536, 192), jnp.bfloat16)
    _attn_params = _attn_mod.init(jax.random.PRNGKey(7), _attn_x0)
    add(
        "packed int8 attention module (serving default)",
        lambda x: _attn_mod.apply(
            _attn_params, x, allow_packed=True, quantized=True
        ),
        [_s(2, 1536, 192)],
        lambda x: _attn_mod.apply(
            _attn_params, x, allow_packed=False, quantized=False
        ),
        tol=8e-2,
    )

    # prologue-fused matmuls (ops/fused_matmul.py) at flagship block shapes
    from boxdreamer_tpu.ops import fused_matmul as fm

    M = 12288  # B=8 x N=1536 rows
    for dt in (jnp.bfloat16, jnp.float32):
        tag = "bf16" if dt == jnp.bfloat16 else "f32"
        add(
            f"gelu_matmul fc2 {tag}",
            functools.partial(fm.gelu_matmul, block_m=256,
                              interpret=interpret),
            [_s(M, 3072, dtype=dt), _s(3072, 768, dtype=dt),
             _s(768, dtype=dt)],
            lambda x, w, b: _gelu_exact(x) @ w + b,
        )
        add(
            f"ln_matmul residual fc1 {tag}",
            functools.partial(fm.ln_matmul, eps=1e-5, block_m=256,
                              interpret=interpret),
            [_s(M, 768, dtype=dt), _s(M, 768, dtype=dt),
             _s(768, 3072, dtype=dt), _s(768, dtype=jnp.float32),
             _s(768, dtype=jnp.float32), _s(3072, dtype=dt)],
            lambda x, h, w, g, be, b: (
                _ln(x + h, g, be, 1e-5) @ w + b, x + h
            ),
        )
    # flagship BETR shape exactly as served (B=8, H=8, N=1536)
    add("fwd flagship B8 H8 N1536", f, qkv(8, 8, 1536), mha)
    add("bwd flagship B8 H8 N1536", fb, bwd_shapes(1536), bwd_ref,
        bwd_inputs(1536))
    return out


def _compile(name, fn, *shapes):
    """Lower + compile fn at the given ShapeDtypeStructs; no data moves."""
    t0 = time.time()
    compiled = jax.jit(fn).lower(*shapes).compile()
    return compiled, f"ok   {name:42s} {time.time() - t0:6.1f}s"


def _check_numerics(name, compiled, ref_fn, make_inputs, tol):
    """Execute the compiled kernel and the XLA reference on the same
    deterministic inputs; return (max relative error, message)."""
    key = jax.random.PRNGKey(zlib.crc32(name.encode()) % (2**31))
    inputs = [jax.device_put(x) for x in make_inputs(key)]
    got = compiled(*inputs)
    want = jax.jit(ref_fn)(*inputs)
    gots = got if isinstance(got, (tuple, list)) else (got,)
    wants = want if isinstance(want, (tuple, list)) else (want,)
    err = max(_rel_err(g, w) for g, w in zip(gots, wants))
    ok = err <= tol
    tagged = f"{'ok  ' if ok else 'FAIL'} {name:42s} rel_err={err:.2e}"
    return ok, tagged


def run(interpret: bool = False, verbose: bool = True,
        numerics: bool = True, numerics_budget_s: "float | None" = None) -> int:
    """Compile (and, unless disabled, numerically check) every variant;
    returns the number of failures.

    ``numerics_budget_s``: wall-clock budget for the numerics executions.
    Through a congested axon tunnel per-variant round-trips can degrade
    from <1 s to >10 s (observed round 5); past the budget the remaining
    variants still COMPILE (the original gate) but skip execution, so a
    slow tunnel degrades the check instead of timing out the caller
    (bench.py's preamble). None = unbounded."""
    failures = 0
    skipped_numerics = 0
    t_start = time.time()
    platform = jax.devices()[0].platform
    if verbose:
        print(f"chip_check: platform={platform} interpret={interpret} "
              f"numerics={numerics}", file=sys.stderr)
    for name, fn, shapes, ref_fn, make_inputs, tol in variants(interpret):
        try:
            compiled, msg = _compile(name, fn, *shapes)
        except Exception as e:  # noqa: BLE001 — report every failure
            failures += 1
            msg = f"FAIL {name:42s} {type(e).__name__}: {str(e)[:300]}"
            compiled = None
        if verbose:
            print(msg, file=sys.stderr)
        if compiled is None or not numerics or ref_fn is None:
            continue
        if (
            numerics_budget_s is not None
            and time.time() - t_start > numerics_budget_s
        ):
            skipped_numerics += 1
            continue
        try:
            ok, msg = _check_numerics(name, compiled, ref_fn, make_inputs, tol)
        except Exception as e:  # noqa: BLE001
            ok = False
            msg = f"FAIL {name:42s} numerics {type(e).__name__}: {str(e)[:300]}"
        if not ok:
            failures += 1
        if verbose:
            print("  num " + msg, file=sys.stderr)
    if skipped_numerics and verbose:
        print(
            f"chip_check: WARNING — numerics budget ({numerics_budget_s:.0f}s)"
            f" exceeded; {skipped_numerics} variant(s) compile-checked only",
            file=sys.stderr,
        )
    return failures


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--interpret", action="store_true",
                        help="interpret mode (CPU smoke run)")
    parser.add_argument("--compile-only", action="store_true",
                        help="skip the numerics executions")
    args = parser.parse_args()
    failures = run(interpret=args.interpret, numerics=not args.compile_only)
    if failures:
        print(f"chip_check: {failures} kernel variant(s) FAILED",
              file=sys.stderr)
        return 1
    print("chip_check: all kernel variants pass", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

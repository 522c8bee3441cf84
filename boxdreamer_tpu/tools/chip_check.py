"""On-chip Pallas kernel regression gate.

Compiles (does NOT time) every Pallas kernel variant on the real TPU in one
run, exiting nonzero on any Mosaic lowering failure. CI runs the kernels in
interpret mode only, and interpret mode does not enforce TPU tiling rules
(CLAUDE.md) — one bad tiling change could pass the full CPU suite. This gate
is the real-chip compile check; bench.py runs it as a preamble so every
recorded BENCH_r*.json implies kernel-compile health.

Variant coverage (ops/attention.py):
  * fwd single-pass (num_kb==1), block-aligned (mask compiled out)
  * fwd masked (Nk % LANE != 0 -> padding mask compiled in)
  * fwd fused qk-RMSNorm (raw q/k + in-kernel norm + fold)
  * fwd multi-KV-block streaming (N > DEFAULT_BLOCK_K)
  * fwd with LSE output (ring-attention local step)
  * bwd dq + dkv kernels, aligned and masked
  * flagship BETR shape end-to-end (what bench.py serves)

Usage: python -m boxdreamer_tpu.tools.chip_check  (runs on the default
platform — the tunneled TPU; pass --interpret for a CPU smoke run).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

from boxdreamer_tpu.ops import attention as attn


def _compile(name, fn, *shapes):
    """Lower + compile fn at the given ShapeDtypeStructs; no data moves."""
    t0 = time.time()
    jax.jit(fn).lower(*shapes).compile()
    return f"ok   {name:42s} {time.time() - t0:6.1f}s"


def _s(*shape, dtype=jnp.bfloat16):
    return jax.ShapeDtypeStruct(shape, dtype)


def variants(interpret: bool = False):
    """(name, fn, arg_shapes) for every kernel variant."""
    D = 96
    scale = D ** -0.5
    f = functools.partial(attn.flash_attention, scale=scale, interpret=interpret)
    fb = functools.partial(
        attn.flash_attention_bwd, scale=scale, interpret=interpret
    )

    def qkv(B, H, N, dtype=jnp.bfloat16):
        return [_s(B, H, N, D, dtype=dtype)] * 3

    out = []
    # fwd: single-pass, block-aligned (mask compiled out) — small N
    out.append(("fwd single-pass aligned", f, qkv(1, 2, 256)))
    # fwd: masked tail (N not a LANE multiple)
    out.append(("fwd masked tail", f, qkv(1, 2, 200)))
    # fwd: fused qk-RMSNorm
    out.append(
        (
            "fwd fused qk-norm",
            lambda q, k, v, wq, wk: attn.flash_attention(
                q, k, v, scale, interpret=interpret, qk_norm_weights=(wq, wk)
            ),
            qkv(1, 2, 256) + [_s(D, dtype=jnp.float32)] * 2,
        )
    )
    # fwd: multi-KV-block streaming (N > DEFAULT_BLOCK_K=1536)
    out.append(("fwd multi-kv-block N=4096", f, qkv(1, 2, 4096)))
    # fwd: LSE output (ring-attention local step)
    out.append(
        (
            "fwd with lse (ring local)",
            functools.partial(
                attn.flash_attention,
                scale=scale,
                interpret=interpret,
                return_lse=True,
            ),
            qkv(1, 2, 512),
        )
    )
    # bwd dq+dkv: aligned and masked
    def bwd_shapes(N):
        return qkv(1, 2, N) + [
            _s(1, 2, N, D),                       # out
            _s(1, 2, N, dtype=jnp.float32),       # lse
            _s(1, 2, N, D),                       # g
        ]

    out.append(("bwd dq/dkv aligned", fb, bwd_shapes(512)))
    out.append(("bwd dq/dkv masked", fb, bwd_shapes(400)))
    # packed-layout kernel (qkv read in place from the projection output)
    def packed_fn(qk_norm):
        def fn(qkv, *w):
            return attn.flash_attention_packed(
                qkv, 8, D, scale, w or None, interpret=interpret
            )
        return fn

    out.append(
        ("fwd packed qk-norm", packed_fn(True),
         [_s(2, 256, 3 * 8 * 128)] + [_s(D, dtype=jnp.float32)] * 2)
    )
    out.append(("fwd packed plain", packed_fn(False), [_s(2, 256, 3 * 8 * 128)]))
    out.append(
        ("fwd packed flagship B8 N1536", packed_fn(True),
         [_s(8, 1536, 3 * 8 * 128)] + [_s(D, dtype=jnp.float32)] * 2)
    )
    # prologue-fused matmuls (ops/fused_matmul.py) at flagship block shapes
    from boxdreamer_tpu.ops import fused_matmul as fm

    M = 12288  # B=8 x N=1536 rows
    for dt in (jnp.bfloat16, jnp.float32):
        tag = "bf16" if dt == jnp.bfloat16 else "f32"
        out.append(
            (f"gelu_matmul fc2 {tag}",
             functools.partial(fm.gelu_matmul, block_m=256,
                               interpret=interpret),
             [_s(M, 3072, dtype=dt), _s(3072, 768, dtype=dt),
              _s(768, dtype=dt)])
        )
        out.append(
            (f"ln_matmul residual fc1 {tag}",
             functools.partial(fm.ln_matmul, eps=1e-5, block_m=256,
                               interpret=interpret),
             [_s(M, 768, dtype=dt), _s(M, 768, dtype=dt),
              _s(768, 3072, dtype=dt), _s(768, dtype=jnp.float32),
              _s(768, dtype=jnp.float32), _s(3072, dtype=dt)])
        )
    # flagship BETR shape exactly as served (B=8, H=8, N=1536)
    out.append(("fwd flagship B8 H8 N1536", f, qkv(8, 8, 1536)))
    out.append(("bwd flagship B8 H8 N1536", fb, bwd_shapes(1536)))
    return out


def run(interpret: bool = False, verbose: bool = True) -> int:
    """Compile every variant; returns the number of failures."""
    failures = 0
    platform = jax.devices()[0].platform
    if verbose:
        print(f"chip_check: platform={platform} "
              f"interpret={interpret}", file=sys.stderr)
    for name, fn, shapes in variants(interpret):
        try:
            msg = _compile(name, fn, *shapes)
        except Exception as e:  # noqa: BLE001 — report every failure
            failures += 1
            msg = f"FAIL {name:42s} {type(e).__name__}: {str(e)[:300]}"
        if verbose:
            print(msg, file=sys.stderr)
    return failures


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--interpret", action="store_true",
                        help="interpret mode (CPU smoke run)")
    args = parser.parse_args()
    failures = run(interpret=args.interpret)
    if failures:
        print(f"chip_check: {failures} kernel variant(s) FAILED",
              file=sys.stderr)
        return 1
    print("chip_check: all kernel variants compile", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

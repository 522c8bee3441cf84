"""Flash-attention kernel tuning harness (real-chip microbenchmark).

Measures candidate kernel configurations at the flagship BETR shape
(B=8, H=8, N=1536, D=96) with the same trust rules as bench.py:

  * one dispatch runs a ``lax.scan`` chain of K kernel invocations with the
    previous output folded into the next input (no per-step tunnel RTT, no
    remote dedup);
  * timing is checked for linearity in K (K and 4K), and the outputs are
    fetched + checksummed;
  * reports ms/call and implied FLOP utilisation.

Usage: python tools/kernel_tune.py [--shape B H N D]
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
import numpy as np


def chain_time(fn, args_init, k_steps: int) -> tuple[float, float]:
    """Time a K-step on-device chain of fn; returns (ms_per_call, checksum)."""

    @jax.jit
    def chained(q, k, v):
        def body(carry, _):
            q, k, v = carry
            out = fn(q, k, v)
            # Fold the output into next q cheaply: keeps a data dependence so
            # nothing can be elided, costs O(N*D) vs the O(N^2*D) kernel.
            q2 = q + 1e-3 * out
            return (q2, k, v), jnp.float32(0.0)

        (q, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=k_steps)
        return jnp.sum(q.astype(jnp.float32))

    # Fetch-timed with a DISTINCT input per timed dispatch: through the
    # axon tunnel block_until_ready can ack early and repeated identical
    # dispatches are deduplicated remotely (see tools/bwd_tune.py /
    # attend_anatomy.py round-3 notes).
    q, k, v = args_init
    float(jax.device_get(chained(q, k, v)))  # compile + warm
    q2 = jax.block_until_ready(q + 1e-3)
    t0 = time.perf_counter()
    s = float(jax.device_get(chained(q2, k, v)))
    dt = time.perf_counter() - t0
    return dt * 1e3, s


def run(B: int, H: int, N: int, D: int) -> None:
    from boxdreamer_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    scale = D ** -0.5

    flops_per_call = 4 * B * H * N * N * D  # 2 matmuls, 2 FLOP/MAC (unpadded)

    # The XLA reference materializes the (B, H, N, N) f32 score tensor —
    # 8.6 GB at B=4/N=8192 (RESOURCE_EXHAUSTED on 16 GB HBM). Beyond ~2 GB,
    # use the flash kernel itself as the numerics reference and drop the
    # XLA candidate.
    scores_bytes = 4 * B * H * N * N
    if scores_bytes < 2 << 30:
        ref = A.mha_reference(q, k, v, scale)
        candidates = {
            "xla": lambda q, k, v: A.mha_reference(q, k, v, scale),
        }
    else:
        print(f"(skipping XLA reference: scores would be "
              f"{scores_bytes/2**30:.1f} GiB)")
        ref = A.flash_attention(q, k, v, scale)
        candidates = {}
    for bq, bk in [(256, 1536), (512, 512), (512, 1536), (768, 1536), (1536, 1536)]:
        if bq > N or bk > N:
            continue
        candidates[f"flash_bq{bq}_bk{bk}"] = functools.partial(
            A.flash_attention, scale=scale, block_q=bq, block_k=bk
        )

    # jax's bundled TPU kernel as a ceiling probe (not shipped; probe only).
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )

        candidates["jax_bundled"] = lambda q, k, v: jax_flash(
            q, k, v, causal=False, sm_scale=scale
        )
    except Exception as e:  # pragma: no cover
        print(f"jax bundled kernel unavailable: {e}")

    print(f"shape B={B} H={H} N={N} D={D}, {flops_per_call/1e9:.1f} GFLOP/call")
    for name, fn in candidates.items():
        try:
            out = fn(q, k, v)
            err = float(
                jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            t8, c8 = chain_time(fn, (q, k, v), 8)
            t40, c40 = chain_time(fn, (q, k, v), 40)
            # Slope removes the fixed dispatch/RTT overhead shared by both.
            ms = (t40 - t8) / 32.0
            util = flops_per_call / (ms * 1e-3) / 1e12
            print(
                f"{name:24s} {ms:7.3f} ms/call  (t8={t8:6.1f} t40={t40:6.1f})  "
                f"eff={util:6.1f} TF/s  maxerr={err:.2e}  sum={c40:.1f}"
            )
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--shape", nargs=4, type=int, default=[8, 8, 1536, 96])
    a = p.parse_args()
    run(*a.shape)

"""Backward-kernel crossover measurement (real chip, chain-slope protocol).

VERDICT round-2 item 3: the Pallas backward got the exp2/scale-folding
treatment; re-measure where it crosses the XLA-lse backward so
FLASH_BWD_PALLAS_MIN_SEQ_LEN (ops/attention.py) reflects the tuned kernel,
not the round-1 one. Times a full fwd+bwd pair per step (what a train step
pays) for both backends at several sequence lengths.

Usage: python tools/bwd_tune.py [--lens 1024 1536 2048 3072]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, H, D = 8, 8, 96


def chain_time(step_fn, args, k_steps):
    @jax.jit
    def chained(q, k, v, g, salt):
        q = q + salt.astype(q.dtype)
        def body(carry, _):
            q, k, v, g = carry
            dq, dk, dv = step_fn(q, k, v, g)
            return (q + 1e-3 * dq, k + 1e-3 * dk, v + 1e-3 * dv, g), None

        (q, _, _, _), _ = jax.lax.scan(body, (q, k, v, g), None, length=k_steps)
        return jnp.sum(q.astype(jnp.float32))

    # Time to the FETCHED value: through the axon tunnel block_until_ready
    # can ack before the work completes (CLAUDE.md) — device_get is the only
    # honest completion signal. The salt makes the warmup and timed dispatch
    # byte-DISTINCT: identical repeated dispatches appear to be deduplicated
    # remotely (CLAUDE.md), which made the round-3 timings optimistic.
    s = float(jax.device_get(chained(*args, jnp.float32(1e-4))))
    t0 = time.perf_counter()
    s = float(jax.device_get(chained(*args, jnp.float32(2e-4))))
    return (time.perf_counter() - t0) * 1e3, s


def run(lens):
    from boxdreamer_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    for N in lens:
        q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
        scale = D**-0.5

        def fwdbwd_pallas(q, k, v, g):
            out, lse = A.flash_attention(q, k, v, scale, return_lse=True)
            return A.flash_attention_bwd(q, k, v, out, lse, g, scale)

        def fwdbwd_xla(q, k, v, g):
            out, lse = A.flash_attention(q, k, v, scale, return_lse=True)
            return A.flash_attention_bwd_xla(q, k, v, out, lse, g, scale)

        print(f"N={N}:", flush=True)
        for name, fn in (("pallas-bwd", fwdbwd_pallas), ("xla-bwd", fwdbwd_xla)):
            try:
                t1, c1 = chain_time(fn, (q, k, v, g), 4)
                t2, c2 = chain_time(fn, (q, k, v, g), 12)
                ms = (t2 - t1) / 8.0
                assert np.isfinite(c2)
                print(f"  {name:12s} {ms:8.2f} ms/fwd+bwd "
                      f"(t4={t1:7.1f} t12={t2:7.1f})", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:12s} FAILED: {type(e).__name__}: {e}", flush=True)


def run_block_sweep(N):
    """VERDICT r4 item 2: sweep per-kernel (dq, dkv) block configs at the
    flagship backward shape — the symmetric 1024 cap exists because
    symmetric 1536 blocks OOM scoped VMEM inside lax loops; asymmetric
    configs may recover the ~13 ms/step backward excess."""
    from boxdreamer_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    scale = D**-0.5

    configs = [
        ("sym1024(old default)", (1024, 1024), (1024, 1024)),
        ("dq1536x768/dkv768x1536", (1536, 768), (768, 1536)),
        ("dq1536x512/dkv512x1536", (1536, 512), (512, 1536)),
        ("dq768x768/dkv768x768", (768, 768), (768, 768)),
    ]
    # LONG chains: at the 12-step spans of the generic tuner, per-config
    # deltas (~0.5 ms/step) drown in tunnel jitter (+-5 ms on a 60 ms
    # fetch) — three round-5 sweeps disagreed by 50% on IDENTICAL configs.
    # A 48-step span amortizes the jitter ~6x.
    print(f"block sweep at N={N}, B={B} H={H} D={D} "
          "(fwd+bwd chain-slope, k16->k64, best-of-2):", flush=True)
    for name, dqb, dkvb in configs:
        def fwdbwd(q, k, v, g, dqb=dqb, dkvb=dkvb):
            out, lse = A.flash_attention(q, k, v, scale, return_lse=True)
            return A.flash_attention_bwd(
                q, k, v, out, lse, g, scale, dq_blocks=dqb, dkv_blocks=dkvb
            )

        try:
            best = float("inf")
            for _ in range(2):
                t1, c1 = chain_time(fwdbwd, (q, k, v, g), 16)
                t2, c2 = chain_time(fwdbwd, (q, k, v, g), 64)
                assert np.isfinite(c2)
                best = min(best, (t2 - t1) / 48.0)
            print(f"  {name:28s} {best:8.2f} ms/fwd+bwd "
                  f"(last t16={t1:7.1f} t64={t2:7.1f})", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:100] if str(e) else type(e).__name__
            print(f"  {name:28s} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--lens", nargs="+", type=int, default=[1024, 1536, 2048, 3072])
    p.add_argument("--blocks", action="store_true",
                   help="sweep per-kernel dq/dkv block configs at --lens[0]")
    a = p.parse_args()
    if a.blocks:
        run_block_sweep(a.lens[0])
    else:
        run(a.lens)

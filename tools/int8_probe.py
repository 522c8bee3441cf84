"""Probe: does the v5e MXU int8 path pay off at BETR serving shapes?

v5e lists ~2x int8 vs bf16 peak (394 vs 197 TOPS). If an int8 dot at the
flagship matmul shapes (rows = B*N = 8*1536, the qkv/proj/fc1/fc2 widths)
delivers >=1.5x measured, an opt-in quantized serving mode is worth
building; below that the dequant epilogues would eat the win. Chain-slope,
fetch-timed, distinct inputs per step.

Usage: python tools/int8_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

ROWS = 8 * 1536
K_STEPS = 1024  # sub-ms per step: long chains or the tunnel noise wins
SHAPES = [  # (K, Nout) of the four BETR matmuls (packed qkv = 3072 lanes)
    ("qkv", 768, 3072),
    ("proj", 1024, 768),
    ("fc1", 768, 3072),
    ("fc2", 3072, 768),
]


def chain_time(fn, x0, w, k_steps, seed):
    @jax.jit
    def chained(x0, w, salt):
        def body(c, _):
            y = fn(c, w)
            # Feed a row back into the next input: serialized, distinct.
            c = c.at[0, 0].add(y[0, 0].astype(c.dtype) * 0 + salt.astype(c.dtype))
            return c, jnp.sum(y[0, :4].astype(jnp.float32))

        c, sums = jax.lax.scan(body, x0, None, length=k_steps)
        return jnp.sum(sums)

    c = chained.lower(x0, w, jnp.float32(0.0)).compile()
    x0, w = jax.device_put(x0), jax.device_put(w)
    s = jax.device_get(c(x0, w, jnp.float32(seed)))
    assert jnp.isfinite(float(s)), s
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        s = jax.device_get(c(x0, w, jnp.float32(seed + 1 + r)))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_ms(fn, x0, w, seed):
    t1 = chain_time(fn, x0, w, K_STEPS, seed)
    t2 = chain_time(fn, x0, w, 2 * K_STEPS, seed + 70)
    return (t2 - t1) / K_STEPS * 1e3


def main():
    results = {}
    key = jax.random.PRNGKey(0)
    for name, k, n in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, hash(name) % 97))
        x_bf = jax.random.normal(kx, (ROWS, k), jnp.bfloat16)
        w_bf = jax.random.normal(kw, (k, n), jnp.bfloat16)
        x_i8 = jax.random.randint(kx, (ROWS, k), -127, 127, jnp.int8)
        w_i8 = jax.random.randint(kw, (k, n), -127, 127, jnp.int8)
        scale = jax.random.uniform(kw, (1, n), jnp.float32) + 0.5

        def mm_bf16(x, w):
            return jnp.dot(x, w)

        def mm_int8(x, w, scale=scale):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # per-output-channel dequant epilogue to bf16 (the real mode's
            # cost shape).
            return (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)

        t_bf = slope_ms(mm_bf16, x_bf, w_bf, seed=11)
        t_i8 = slope_ms(mm_int8, x_i8, w_i8, seed=23)
        gf = 2 * ROWS * k * n / 1e9
        results[name] = {
            "bf16_ms": round(t_bf, 3),
            "int8_ms": round(t_i8, 3),
            "speedup": round(t_bf / t_i8, 2),
            "bf16_tflops": round(gf / t_bf, 1),
            "int8_tops": round(gf / t_i8, 1),
        }
        print(f"{name} ({ROWS}x{k}x{n}): bf16 {t_bf:.3f} ms "
              f"({gf/t_bf:.0f} TF/s) | int8 {t_i8:.3f} ms "
              f"({gf/t_i8:.0f} TOP/s) | {t_bf/t_i8:.2f}x",
              file=sys.stderr, flush=True)

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "rows": ROWS, "results": results}))


if __name__ == "__main__":
    main()

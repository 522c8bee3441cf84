"""A/B: DINOv2 encoder forward with XLA short-seq attention vs forced flash.

The serving profile (tools/stage_profile.py) shows enc at ~3.0 ms/step vs a
~1.8 ms matmul ideal. Suspect: at N=261 the dispatch routes to XLA
attention (FLASH_MIN_SEQ_LEN=1024), which materializes the (B, 12, 261,
261) score tensor + transposes every layer. This measures the full
DinoViT forward (B=8) both ways, chain-slope fetch-timed with per-call
salts, params as jit args (axon remote-compile gotcha).

Usage: python tools/enc_attn_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B = 8
SIZE = 224
K_STEPS = 16


def chain_time(apply_fn, params, images, k_steps, seed):
    @jax.jit
    def chained(params, images, salt):
        def body(carry, _):
            x = images + (salt + carry) * 1e-20
            toks = apply_fn(params, x)
            return jnp.sum(toks.astype(jnp.float32)), None

        csum, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k_steps)
        return csum

    c = chained.lower(params, images, jnp.float32(0.0)).compile()
    params = jax.device_put(params)
    images = jax.device_put(images)
    jax.device_get(c(params, images, jnp.float32(seed)))  # warmup
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(c(params, images, jnp.float32(seed + 1 + r)))
        best = min(best, time.perf_counter() - t0)
        assert jnp.isfinite(out)
    return best


def slope_ms(apply_fn, params, images, seed):
    t1 = chain_time(apply_fn, params, images, K_STEPS, seed)
    t2 = chain_time(apply_fn, params, images, 2 * K_STEPS, seed + 50)
    return (t2 - t1) / K_STEPS * 1e3, t1 * 1e3, t2 * 1e3


def main():
    import argparse

    from boxdreamer_tpu.models.dinov2 import DinoViT, DinoViTConfig
    from boxdreamer_tpu.ops import attention as attn_ops

    global B, K_STEPS
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--k", type=int, default=K_STEPS)
    ap.add_argument("--xla-only", action="store_true")
    a = ap.parse_args()
    B, K_STEPS = a.batch, a.k

    model = DinoViT(DinoViTConfig())
    images = jax.random.uniform(jax.random.PRNGKey(0), (B, 3, SIZE, SIZE))
    params = model.init(jax.random.PRNGKey(1), images[:1])

    def apply_fn(p, x):
        return model.apply(p, x)

    results = {}
    default_gate = attn_ops.FLASH_MIN_SEQ_LEN
    default_mh = attn_ops.MHA_MULTIHEAD_MIN_BH
    # (name, FLASH_MIN_SEQ_LEN, MHA_MULTIHEAD_MIN_BH): 'multihead' forces
    # the round-5 whole-head-stack short-sequence kernel.
    variants = (("xla", default_gate, None),) if a.xla_only else (
        ("xla", default_gate, None),
        ("flash", 1, None),
        ("multihead", default_gate, 1),
    )
    for name, gate, mh in variants:
        attn_ops.FLASH_MIN_SEQ_LEN = gate
        attn_ops.MHA_MULTIHEAD_MIN_BH = mh
        try:
            s, t1, t2 = slope_ms(apply_fn, params, images, seed=17 * gate + (mh or 0))
            results[name] = {
                "ms_per_step": round(s, 3),
                "chainK_ms": round(t1, 1),
                "chain2K_ms": round(t2, 1),
            }
            print(f"{name}: {s:.3f} ms/step (K {t1:.1f}, 2K {t2:.1f})",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
            print(f"{name}: FAILED {msg}", file=sys.stderr, flush=True)
            results[name] = {"error": msg}
        finally:
            attn_ops.FLASH_MIN_SEQ_LEN = default_gate
            attn_ops.MHA_MULTIHEAD_MIN_BH = default_mh

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "batch": B, "results": results}))


if __name__ == "__main__":
    main()

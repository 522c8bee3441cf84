"""A/B: full serving program (predict_query) bf16 vs int8 quantized BETR.

Measures the end-to-end serving win of BETRConfig.quantize='int8' on the
real chip with the bench chain protocol (distinct salted queries, K/2K
slope, fetch-timed). The encoder, decode, and PnP stages are identical in
both modes — only the 12x4 BETR matmuls change — so the delta is the int8
win net of quantize/dequant overheads.

Usage: python tools/int8_serving_ab.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import jax.numpy as jnp

N_REFS = 5
SIZE = 224
BATCH = 8
K_STEPS = 16


def main():
    global BATCH, K_STEPS
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=K_STEPS)
    ap.add_argument("--only", default=None,
                    help="substring filter over config names")
    a = ap.parse_args()
    BATCH, K_STEPS = a.batch, a.k
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.predictor import Predictor, predict_query

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    ref_images = jax.random.uniform(ks[0], (BATCH, N_REFS, 3, SIZE, SIZE))
    ref_bbox_feat = (
        jax.random.uniform(ks[1], (BATCH, N_REFS, 8, SIZE, SIZE)) * 2 - 1
    )
    bbox_3d = jax.random.normal(ks[2], (BATCH, 8, 3)) * 0.1
    K_intr = jnp.broadcast_to(
        jnp.array([[900.0, 0, 112.0], [0, 900.0, 112.0], [0, 0, 1.0]]),
        (BATCH, 3, 3),
    )

    def build(quantize, enc_quantize=None):
        cfg = BoxDreamerConfig()
        cfg = dataclasses.replace(
            cfg,
            betr=dataclasses.replace(cfg.betr, quantize=quantize),
            dino=dataclasses.replace(cfg.dino, quantize=enc_quantize),
        )
        model = BoxDreamer(cfg)
        mask = jnp.zeros((1, N_REFS + 1), dtype=bool).at[:, -1].set(True)
        init_images = jnp.concatenate(
            [ref_images[:1], ref_images[:1, :1]], axis=1
        )
        init_bf = jnp.concatenate(
            [ref_bbox_feat[:1], ref_bbox_feat[:1, :1]], axis=1
        )
        params = model.init(ks[3], init_images, init_bf, mask)
        predictor = Predictor(model, params)
        predictor.set_references(ref_images, ref_bbox_feat, bbox_3d)
        return model, params, predictor._refs

    def chain_time(model, params, refs, k_steps, seed):
        def chain(params, tok, bf, b3, kmat, fz, queries):
            def step(carry, q):
                q = q + carry * 1e-20
                out = predict_query(
                    model, params, q, tok, bf, b3, kmat, ref_fuse=fz
                )
                c = jnp.sum(out["pred_poses"].astype(jnp.float32))
                return c, c

            final, _ = jax.lax.scan(step, jnp.float32(0.0), queries)
            return final

        queries = jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(40), seed),
            (k_steps, BATCH, 3, SIZE, SIZE),
        )
        args = (params, refs["tokens"], refs["bbox_feat"], refs["bbox_3d"],
                K_intr, refs["fuse"], queries)
        c = jax.jit(chain).lower(*args).compile()
        args = jax.device_put(args)
        out = jax.device_get(c(*args))  # warmup
        assert jnp.isfinite(out), out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.device_get(c(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    from boxdreamer_tpu.ops import quant as _quant

    results = {}
    for name, q, eq, fused_bm in (
        ("bf16", None, None, None),
        ("int8", "int8", None, None),
        ("int8_fusedq", "int8", None, 256),  # Pallas single-pass act quantize
        ("int8_full", "int8", "int8", None),  # + encoder blocks quantized
    ):
        if a.only and name not in a.only.split(","):
            continue
        print(f"building {name}...", file=sys.stderr, flush=True)
        _quant.FUSED_QUANTIZE_BLOCK_M = fused_bm
        model, params, refs = build(q, eq)
        t1 = chain_time(model, params, refs, K_STEPS, seed=3)
        t2 = chain_time(model, params, refs, 2 * K_STEPS, seed=9)
        slope = (t2 - t1) / K_STEPS * 1e3
        fps = BATCH / (slope / 1e3)
        results[name] = {
            "ms_per_step": round(slope, 2),
            "fps": round(fps, 1),
            "chainK_ms": round(t1 * 1e3, 1),
            "chain2K_ms": round(t2 * 1e3, 1),
        }
        print(f"  {name}: {slope:.2f} ms/step = {fps:.1f} FPS",
              file=sys.stderr, flush=True)
    _quant.FUSED_QUANTIZE_BLOCK_M = None

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "batch": BATCH, "results": results}))


if __name__ == "__main__":
    main()

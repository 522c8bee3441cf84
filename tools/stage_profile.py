"""Per-stage serving-cost profile of the flagship query program (real chip).

Measures ms/step of successive pipeline prefixes with the same trusted
chain-slope protocol as bench.py / tools/kernel_tune.py:

    enc      : DINOv2 query encode
    embed    : + decoder query-frame embedding
    betr     : + 12-layer BETR attend -> heatmaps
    decode   : + top-k corner decode
    full     : + batched DLT+GN PnP

Each stage timing is the SLOPE between a K-step and a 2K-step on-device
lax.scan chain (dispatch overhead cancels; remote dedup prevented by a
data dependence through each step's output). Stage deltas localize the
per-frame cost; run a few times — the shared tunnel is noisy.

Usage: python tools/stage_profile.py [--batch 8] [--k 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
from boxdreamer_tpu.models.predictor import (
    Predictor,
    decoder_attend,
    decoder_embed,
    encoder_apply,
)
from boxdreamer_tpu.ops import decode as decode_ops
from boxdreamer_tpu.ops import pnp as pnp_ops

N_REFS = 5
SIZE = 224


def build(batch: int, quantize=None):
    from boxdreamer_tpu.models import BETRConfig

    model = BoxDreamer(
        BoxDreamerConfig(betr=BETRConfig(quantize=quantize))
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    ref_images = jax.random.uniform(ks[0], (batch, N_REFS, 3, SIZE, SIZE))
    ref_bf = jax.random.uniform(ks[1], (batch, N_REFS, 8, SIZE, SIZE)) * 2 - 1
    bbox_3d = jax.random.normal(ks[2], (batch, 8, 3)) * 0.1
    K_intr = jnp.broadcast_to(
        jnp.array([[900.0, 0, 112.0], [0, 900.0, 112.0], [0, 0, 1.0]]),
        (batch, 3, 3),
    )
    mask = jnp.zeros((1, N_REFS + 1), dtype=bool).at[:, -1].set(True)
    init_images = jnp.concatenate([ref_images[:1], ref_images[:1, :1]], axis=1)
    init_bf = jnp.concatenate([ref_bf[:1], ref_bf[:1, :1]], axis=1)
    params = model.init(ks[3], init_images, init_bf, mask)
    predictor = Predictor(model, params)
    predictor.set_references(ref_images, ref_bf, bbox_3d)
    return model, params, predictor._refs, K_intr, batch


def stage_fn(model, batch, stage: str):
    cfg = model.config
    B = batch
    T = N_REFS + 1
    camera_mask = jnp.zeros((B, T), dtype=bool).at[:, -1].set(True)

    def fn(params, refs, K_intr, q_img):
        ref_fuse = refs["fuse"]
        ref_bf = refs["bbox_feat"]
        bbox_3d = refs["bbox_3d"]
        c = ref_bf.shape[2]
        S = ref_bf.shape[-1]
        q_tokens = encoder_apply(model, params, q_img)
        if stage == "enc":
            return jnp.sum(q_tokens.astype(jnp.float32))
        q_mask = jnp.ones((B, 1), dtype=bool)
        q_fuse = decoder_embed(
            model, params,
            jnp.zeros((B, 1, c, S, S), ref_bf.dtype), q_mask, q_tokens[:, None],
        )
        if stage == "embed":
            return jnp.sum(q_fuse.astype(jnp.float32))
        fuse = jnp.concatenate([ref_fuse.astype(q_fuse.dtype), q_fuse], axis=1)
        heat = decoder_attend(model, params, fuse, camera_mask)
        if stage == "betr":
            return jnp.sum(heat.astype(jnp.float32))
        norm_kpts, kpts = decode_ops.decode_bbox_features(
            heat, cfg.bbox_representation, k=cfg.decode_topk
        )
        if stage == "decode":
            return jnp.sum(kpts.astype(jnp.float32))
        poses = pnp_ops.solve_pnp(bbox_3d, kpts, K_intr, iters=cfg.pnp_iters)
        return jnp.sum(poses.astype(jnp.float32))

    return fn


def chain_time(fn, params, refs, K_intr, batch, k_steps, seed):
    # params/refs are jit ARGUMENTS (a closure would bake them into the
    # HLO as literals — the axon remote-compile endpoint rejects the
    # resulting payload with HTTP 413).
    @jax.jit
    def chained(params, refs, K_intr, q0):
        def body(carry, _):
            q, acc = carry
            s = fn(params, refs, K_intr, q)
            # Data dependence: fold the scalar back into the image cheaply.
            return (q + s * 1e-20, acc + s), jnp.float32(0.0)

        (q, acc), _ = jax.lax.scan(
            body, (q0, jnp.float32(0.0)), None, length=k_steps
        )
        return acc

    q0 = jax.random.uniform(jax.random.PRNGKey(seed), (batch, 3, SIZE, SIZE))
    out = jax.device_get(chained(params, refs, K_intr, q0))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(chained(params, refs, K_intr, q0))
        best = min(best, time.perf_counter() - t0)
    assert jnp.isfinite(out)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument(
        "--stages", default="enc,embed,betr,decode,full",
        help="comma-separated subset (each stage costs 2 chain compiles)",
    )
    ap.add_argument("--int8", action="store_true",
                    help="profile the promoted int8 serving mode")
    args = ap.parse_args()

    model, params, refs, K_intr, batch = build(
        args.batch, quantize="int8" if args.int8 else None
    )
    print(
        f"stage profile (batch {args.batch}, slope of {args.k}->"
        f"{2*args.k} chain steps):",
        flush=True,
    )
    for stage in args.stages.split(","):
        fn = stage_fn(model, batch, stage)
        t1 = chain_time(fn, params, refs, K_intr, batch, args.k, 11)
        print(f"  {stage:7s}: K-chain {t1*1e3:8.1f} ms", flush=True)
        t2 = chain_time(fn, params, refs, K_intr, batch, 2 * args.k, 12)
        ms = (t2 - t1) / args.k * 1e3
        print(
            f"  {stage:7s}: {ms:7.2f} ms/step "
            f"({ms/args.batch:6.3f} ms/frame)",
            flush=True,
        )


if __name__ == "__main__":
    main()

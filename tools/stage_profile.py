"""Per-stage slope profiling of the flagship query program on the real chip.

Times each stage of predict_query (encoder / query embed / decoder attend /
decode+PnP) as an on-device lax.scan chain (same trust rules as bench.py:
slope between two chain lengths removes dispatch/RTT overhead). Guides
kernel work: the stage with the largest gap between measured time and its
matmul-FLOP lower bound is the next target.

Usage: PYTHONPATH=. python tools/stage_profile.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH, N_REFS, SIZE = 8, 5, 224


def slope(fn, x, k1=8, k2=24):
    """ms/call via chained scan slope; fn: x -> array foldable into x."""

    def chained(k):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(c)
                return c + 1e-9 * jnp.mean(out.astype(jnp.float32)).astype(c.dtype), 0.0

            c, _ = jax.lax.scan(body, x, None, length=k)
            return jnp.sum(c.astype(jnp.float32))

        run(x).block_until_ready()
        t0 = time.perf_counter()
        run(x).block_until_ready()
        return (time.perf_counter() - t0) * 1e3

    return (chained(k2) - chained(k1)) / (k2 - k1)


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.predictor import (
        Predictor,
        decoder_attend,
        decoder_embed,
        encoder_apply,
    )
    from boxdreamer_tpu.ops import decode as decode_ops
    from boxdreamer_tpu.ops import pnp as pnp_ops

    model = BoxDreamer(BoxDreamerConfig())
    cfg = model.config
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    ref_images = jax.random.uniform(ks[0], (BATCH, N_REFS, 3, SIZE, SIZE))
    ref_bf = jax.random.uniform(ks[1], (BATCH, N_REFS, 8, SIZE, SIZE)) * 2 - 1
    bbox_3d = jax.random.normal(ks[2], (BATCH, 8, 3)) * 0.1
    K_intr = jnp.broadcast_to(
        jnp.array([[900.0, 0, 112.0], [0, 900.0, 112.0], [0, 0, 1.0]]),
        (BATCH, 3, 3),
    )
    mask = jnp.zeros((1, N_REFS + 1), dtype=bool).at[:, -1].set(True)
    init_images = jnp.concatenate([ref_images[:1], ref_images[:1, :1]], axis=1)
    init_bf = jnp.concatenate([ref_bf[:1], ref_bf[:1, :1]], axis=1)
    params = model.init(ks[3], init_images, init_bf, mask)

    predictor = Predictor(model, params)
    predictor.set_references(ref_images, ref_bf, bbox_3d)
    refs = predictor._refs
    ref_fuse = refs["ref_fuse"]

    query = jax.random.uniform(ks[4], (BATCH, 3, SIZE, SIZE))

    # Stage fixtures
    q_tokens = encoder_apply(model, params, query)
    B = BATCH
    c = ref_bf.shape[2]
    q_mask = jnp.ones((B, 1), dtype=bool)
    q_fuse = decoder_embed(
        model, params, jnp.zeros((B, 1, c, SIZE, SIZE), ref_bf.dtype),
        q_mask, q_tokens[:, None],
    )
    fuse = jnp.concatenate([ref_fuse.astype(q_fuse.dtype), q_fuse], axis=1)
    camera_mask = jnp.zeros((B, N_REFS + 1), dtype=bool).at[:, -1].set(True)
    heatmaps = decoder_attend(model, params, fuse, camera_mask)

    stages = {
        "encoder(query)": (lambda x: encoder_apply(model, params, x), query),
        "decoder_embed(query)": (
            lambda x: decoder_embed(
                model, params,
                jnp.zeros((B, 1, c, SIZE, SIZE), ref_bf.dtype),
                q_mask, x[:, None],
            ),
            q_tokens,
        ),
        "decoder_attend": (
            lambda x: decoder_attend(model, params, x, camera_mask), fuse
        ),
        "decode+pnp": (
            lambda x: pnp_ops.solve_pnp(
                bbox_3d,
                decode_ops.decode_bbox_features(
                    x, cfg.bbox_representation, k=cfg.decode_topk
                )[1],
                K_intr.astype(jnp.float32),
                iters=cfg.pnp_iters,
            ),
            heatmaps,
        ),
    }
    total = 0.0
    for name, (fn, x) in stages.items():
        ms = slope(fn, x)
        total += ms
        print(f"{name:22s} {ms:7.3f} ms/batch{BATCH}")
    print(f"{'sum of stages':22s} {total:7.3f} ms -> {BATCH / total * 1e3:.1f} FPS-equivalent")


if __name__ == "__main__":
    main()

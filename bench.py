"""Benchmark: per-frame query-pose inference throughput on one TPU chip.

Protocol mirrors the reference's headline figure (README FAQ: >40 FPS with 5
reference images on an RTX 4090, per-frame tracking in the demo pipeline
src/demo/demo.py:1499-1612): 5 cached references + 1 query crop at 224x224,
flagship model (DINOv2 ViT-B/14-reg + 12-layer BETR), bf16 compute. Each
timed iteration runs the FULL on-device program — query DINOv2 encode, BETR
over 1536 tokens, top-k corner decode, and the batched PnP solve — i.e. the
same work the reference splits across CUDA + CPU OpenCV per frame.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 40.0  # RTX 4090, reference README.md:371
N_REFS = 5
SIZE = 224
WARMUP = 10
ITERS = 100


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.predictor import Predictor

    model = BoxDreamer(BoxDreamerConfig())
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)

    ref_images = jax.random.uniform(ks[0], (1, N_REFS, 3, SIZE, SIZE))
    ref_bbox_feat = jax.random.uniform(ks[1], (1, N_REFS, 8, SIZE, SIZE)) * 2 - 1
    bbox_3d = jax.random.normal(ks[2], (1, 8, 3)) * 0.1
    K = jnp.broadcast_to(
        jnp.array([[900.0, 0, 112.0], [0, 900.0, 112.0], [0, 0, 1.0]]), (1, 3, 3)
    )
    query = jax.random.uniform(ks[3], (1, 3, SIZE, SIZE))

    mask = jnp.zeros((1, N_REFS + 1), dtype=bool).at[:, -1].set(True)
    images = jnp.concatenate([ref_images, query[:, None]], axis=1)
    bbox_feat = jnp.concatenate([ref_bbox_feat, ref_bbox_feat[:, :1]], axis=1)
    params = model.init(ks[4], images, bbox_feat, mask)

    predictor = Predictor(model, params)
    predictor.set_references(ref_images, ref_bbox_feat, bbox_3d)

    # Distinct query frames per iteration (defeats any dedup/caching between
    # identical dispatches) — pre-generated on device.
    queries = [
        jax.block_until_ready(jax.random.uniform(k, (1, 3, SIZE, SIZE)))
        for k in jax.random.split(ks[5], ITERS)
    ]

    # Warmup (compile).
    for _ in range(WARMUP):
        out = predictor.predict(query, K)
    jax.block_until_ready(out["pred_poses"])

    t0 = time.perf_counter()
    outs = [predictor.predict(q, K)["pred_poses"] for q in queries]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    fps = ITERS / dt
    print(
        json.dumps(
            {
                "metric": "query_pose_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

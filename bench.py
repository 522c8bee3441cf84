"""Benchmark: query-pose inference throughput per chip (LINEMOD-eval protocol).

Measures the BASELINE.json metric — frames/sec/chip on the LINEMOD eval
protocol: batched query inference (batch 8, the reference's eval loader
size, configs/datamodule/test.yaml) against 5 cached reference views at
224x224, flagship model (DINOv2 ViT-B/14-reg + 12-layer BETR), bf16
compute. Every timed dispatch runs the FULL on-device program per query —
DINOv2 encode, BETR over 1536 tokens, top-k corner decode, batched DLT+GN
PnP — the work the reference splits across CUDA and per-sample OpenCV CPU
calls (>40 FPS single-stream on an RTX 4090, README FAQ).

Protocol notes: 20 distinct query batches (no repeated dispatches — remote
runtimes may dedupe identical calls), warmup excluded, one
block_until_ready over all outputs. Single-stream latency is additionally
reported to stderr for context.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 40.0  # RTX 4090, reference README.md:371
N_REFS = 5
SIZE = 224
BATCH = 8  # reference eval loader batch (configs/datamodule/test.yaml)
WARMUP = 3
ITERS = 20


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.predictor import Predictor

    model = BoxDreamer(BoxDreamerConfig())
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    ref_images = jax.random.uniform(ks[0], (BATCH, N_REFS, 3, SIZE, SIZE))
    ref_bbox_feat = (
        jax.random.uniform(ks[1], (BATCH, N_REFS, 8, SIZE, SIZE)) * 2 - 1
    )
    bbox_3d = jax.random.normal(ks[2], (BATCH, 8, 3)) * 0.1
    K = jnp.broadcast_to(
        jnp.array([[900.0, 0, 112.0], [0, 900.0, 112.0], [0, 0, 1.0]]),
        (BATCH, 3, 3),
    )
    mask = jnp.zeros((1, N_REFS + 1), dtype=bool).at[:, -1].set(True)
    init_images = jnp.concatenate(
        [ref_images[:1], ref_images[:1, :1]], axis=1
    )
    init_bf = jnp.concatenate([ref_bbox_feat[:1], ref_bbox_feat[:1, :1]], axis=1)
    params = model.init(ks[3], init_images, init_bf, mask)

    predictor = Predictor(model, params)
    predictor.set_references(ref_images, ref_bbox_feat, bbox_3d)

    batches = [
        jax.block_until_ready(jax.random.uniform(k, (BATCH, 3, SIZE, SIZE)))
        for k in jax.random.split(ks[4], ITERS + WARMUP)
    ]

    # Warmup / compile.
    for q in batches[:WARMUP]:
        out = predictor.predict(q, K)
    jax.block_until_ready(out["pred_poses"])

    t0 = time.perf_counter()
    outs = [predictor.predict(q, K)["pred_poses"] for q in batches[WARMUP:]]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = ITERS * BATCH / dt

    # Context: single-stream latency with a serialized dependency chain
    # (next input depends on the previous pose; nothing can pipeline).
    q1 = batches[0][:1]
    K1 = K[:1]
    ref1 = {
        "tokens": predictor._refs["tokens"][:1],
        "bbox_feat": predictor._refs["bbox_feat"][:1],
        "bbox_3d": predictor._refs["bbox_3d"][:1],
    }
    predictor._refs = ref1
    out = predictor.predict(q1, K1)
    jax.block_until_ready(out["pred_poses"])
    t0 = time.perf_counter()
    fb = out["pred_poses"].sum() * 1e-12
    n_serial = 10
    for _ in range(n_serial):
        out = predictor.predict(q1 + fb, K1)
        fb = out["pred_poses"].sum() * 1e-12
    jax.block_until_ready(out["pred_poses"])
    latency_ms = (time.perf_counter() - t0) / n_serial * 1e3
    print(
        f"single-stream serialized latency: {latency_ms:.1f} ms/frame "
        f"(includes host-device round-trip)",
        file=sys.stderr,
    )

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

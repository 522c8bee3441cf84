"""Benchmark: query-pose inference throughput per chip (LINEMOD-eval protocol).

Measures the BASELINE.json metric — frames/sec/chip on the LINEMOD eval
protocol: batched query inference (batch 8, the reference's eval loader
size, configs/datamodule/test.yaml) against 5 cached reference views at
224x224, flagship model (DINOv2 ViT-B/14-reg + 12-layer BETR). Every frame
runs the FULL on-device program — DINOv2 encode, BETR over 1536 tokens,
top-k corner decode, batched DLT+GN PnP — the work the reference splits
across CUDA and per-sample OpenCV CPU calls (>40 FPS single-stream on an
RTX 4090, README FAQ).

Serving mode: int8 decoder GEMMs (the round-4 opt-in mode, promoted to the
serving default in round 5 after the in-env accuracy proxy passed —
tests/parity/test_int8_accuracy.py trains flagship-width weights and shows
identical pose-metric buckets and <1px keypoint deltas vs float; measured
+16.5% over bf16 on v5e, tools/int8_serving_ab.py). Attention, encoder,
decode, and PnP stay bf16/f32. Set BENCH_BF16=1 to bench the bf16 path.

Measurement protocol (self-validating — see VERDICT.md round-1 item 1):
the timed unit is ONE dispatch of a `lax.scan` chain of K full query
programs running entirely on device. Each scan step consumes a distinct
pre-generated query batch, and the previous step's pose checksum is folded
into the next step's input, so (a) the remote runtime cannot dedupe or
reorder steps, (b) there is no per-step host round-trip to hide or to pay,
and (c) the K steps are provably serialized by data dependency. We then:

  1. time the chain at K and at 2K and require near-linear scaling
     (a sub-linear ratio means steps were elided/cached — abort);
  2. fetch the outputs and checksum them (finite, non-zero);
  3. compute FLOPs/frame from XLA's own cost model
     (compiled.cost_analysis(), analytic fallback) and print the implied
     MFU against the most generous single-chip bf16 peak — REFUSING to
     report any number whose implied MFU exceeds 100%.

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
# Chain length; also timed at 2*K_STEPS for the linearity check. 32 (up
# from 16, round 5): the fetch pays one transport round-trip (~20-40 ms
# through the axon tunnel) per dispatch; at 2K=64 steps x batch 8 = 512
# frames that fixed cost is ~2x better amortized — same protocol, less
# transport artifact in a throughput metric. Compile time is unchanged
# (the scan body compiles once regardless of length).
K_STEPS = 32
REPEATS = 3  # best-of timing per chain length

# Most generous known single-chip bf16 peak (TPU v6e/Trillium). Using the
# largest plausible peak makes the MFU guard conservative: any number that
# trips it is impossible on EVERY chip.
PEAK_BF16_FLOPS = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}
PEAK_FALLBACK = 918e12


def _chip_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    return PEAK_FALLBACK


def _analytic_flops_per_frame() -> float:
    """Closed-form FLOP estimate of the per-frame program (fallback when the
    backend exposes no cost model). Transformer layer = 24*N*d^2 + 4*N^2*d
    (QKVO + MLP4x + 2 attention matmuls, MAC=2 FLOPs)."""
    d = 768
    n_dino = 261  # 256 patches + cls + 4 registers
    n_betr = (N_REFS + 1) * 256
    per_layer = lambda n: 24 * n * d * d + 4 * n * n * d
    return 12 * per_layer(n_dino) + 12 * per_layer(n_betr)


def _compiled_flops(compiled) -> float:
    """Total FLOPs of a compiled program from XLA's cost model, or 0.0."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.predictor import (
        Predictor,
        predict_query,
    )
    from boxdreamer_tpu.tools import chip_check

    # Kernel regression gate: every Pallas variant must COMPILE on this
    # chip before any number is reported (CI runs interpret-mode only,
    # which does not enforce TPU tiling rules); numerics execute within a
    # wall-clock budget so a congested tunnel (observed >10 s/variant)
    # degrades the gate to compile-only instead of starving the timed runs.
    print("chip_check preamble...", file=sys.stderr, flush=True)
    if chip_check.run(numerics_budget_s=180.0):
        print("ERROR: kernel variant failed to compile; refusing to bench.",
              file=sys.stderr)
        sys.exit(1)

    import os

    from boxdreamer_tpu.models import BETRConfig

    bf16_flag = os.environ.get("BENCH_BF16", "").strip().lower()
    quantize = None if bf16_flag not in ("", "0", "false", "no") else "int8"
    print(f"serving mode: {'bf16' if quantize is None else quantize}",
          file=sys.stderr, flush=True)
    model = BoxDreamer(BoxDreamerConfig(betr=BETRConfig(quantize=quantize)))
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
    mask = jnp.zeros((1, N_REFS + 1), dtype=bool).at[:, -1].set(True)
    init_images = jnp.concatenate([ref_images[:1], ref_images[:1, :1]], axis=1)
    init_bf = jnp.concatenate([ref_bbox_feat[:1], ref_bbox_feat[:1, :1]], axis=1)
    params = model.init(ks[3], init_images, init_bf, mask)

    predictor = Predictor(model, params)
    predictor.set_references(ref_images, ref_bbox_feat, bbox_3d)
    refs = predictor._refs

    def chain(params, ref_tokens, ref_bf, box3d, kmat, ref_fuse, queries):
        """K serialized full query programs in ONE dispatch.

        carry: f32 scalar derived from the previous pose, folded into the
        next query at 1e-20 scale — numerically inert (queries are O(1))
        but creates a true data dependency across steps.
        """

        def step(carry, q):
            q = q + carry * 1e-20
            out = predict_query(
                model, params, q, ref_tokens, ref_bf, box3d, kmat,
                ref_fuse=ref_fuse,
            )
            poses = out["pred_poses"]
            checksum = jnp.sum(poses.astype(jnp.float32))
            return checksum, checksum

        final, sums = jax.lax.scan(step, jnp.float32(0.0), queries)
        return final, sums

    jitted = jax.jit(chain)

    def make_queries(n, seed):
        qs = jax.random.uniform(
            jax.random.PRNGKey(seed), (n, BATCH, 3, SIZE, SIZE)
        )
        return jax.block_until_ready(qs)

    q1 = make_queries(K_STEPS, 100)
    q2 = make_queries(2 * K_STEPS, 200)

    common = (
        params,
        refs["tokens"],
        refs["bbox_feat"],
        refs["bbox_3d"],
        K_intr,
        refs["fuse"],
    )

    def stage(msg):
        print(msg, file=sys.stderr, flush=True)

    # Compile both chain lengths up front (scan body compiles once each).
    stage("compiling chain K...")
    lowered = jitted.lower(*common, q1)
    compiled1 = lowered.compile()
    stage("compiling chain 2K...")
    compiled2 = jitted.lower(*common, q2).compile()

    def timed(fn, queries):
        # Time to FETCHED host data, not block_until_ready: through remote
        # transports (axon tunnel) block_until_ready can ack before the work
        # completes, which is exactly the round-1 artifact this bench
        # refuses to reproduce. The outputs are K scalars, so the fetch
        # costs one transport round-trip, amortized over K*BATCH frames.
        best = float("inf")
        outs = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            outs = jax.device_get(fn(*common, queries))
            best = min(best, time.perf_counter() - t0)
        return best, outs

    # Warmup both (first run may include device-side caching/layout work).
    stage("warmup K...")
    jax.device_get(compiled1(*common, q1))
    stage("warmup 2K...")
    jax.device_get(compiled2(*common, q2))

    stage("timing...")
    t1, outs1 = timed(compiled1, q1)
    t2, outs2 = timed(compiled2, q2)

    # --- Self-validation ---------------------------------------------------
    # 1. Output checksums: fetched to host, finite and non-zero.
    final1, sums1 = outs1
    final2, sums2 = outs2
    for name, final, sums, n in (
        ("K", final1, sums1, K_STEPS),
        ("2K", final2, sums2, 2 * K_STEPS),
    ):
        ok = (
            sums.shape == (n,)
            and bool(jnp.all(jnp.isfinite(sums)))
            and bool(jnp.any(sums != 0.0))
            and float(final) == float(sums[-1])
        )
        if not ok:
            print(f"ERROR: chain {name} output checksum invalid", file=sys.stderr)
            sys.exit(1)
    print(
        f"checksums: K={float(final1):.6e} 2K={float(final2):.6e}",
        file=sys.stderr,
    )

    # 2. Linearity: doubling the chain must ~double the time. Sub-linear
    # scaling means steps were elided (dedup/caching artifact) — refuse.
    ratio = t2 / t1
    print(
        f"chain timing: K={K_STEPS} -> {t1*1e3:.1f} ms, "
        f"2K={2*K_STEPS} -> {t2*1e3:.1f} ms (ratio {ratio:.2f})",
        file=sys.stderr,
    )
    if not (1.6 <= ratio <= 2.6):
        print(
            f"ERROR: chain time ratio {ratio:.2f} outside [1.6, 2.6] — "
            "timing does not scale with work; refusing to report.",
            file=sys.stderr,
        )
        sys.exit(1)

    frames = 2 * K_STEPS * BATCH
    fps = frames / t2

    # 3. Physics: implied MFU must be < 100% of the most generous chip peak.
    # FLOPs come from the already-compiled chain program (XLA's cost model
    # counts a lax.scan body once, not x K, so the chain compile reports
    # ~one step's FLOPs). A separate single-step compile would be cleaner
    # but costs minutes through a congested tunnel; instead the cost-model
    # number is only trusted within a 4x window of the closed-form
    # transformer estimate — outside it (e.g. a backend that unrolls the
    # scan in its cost model) the analytic value is used.
    chain_flops = _compiled_flops(compiled1)
    analytic = _analytic_flops_per_frame()
    step_flops = chain_flops / BATCH
    if 0.25 * analytic <= step_flops <= 4.0 * analytic:
        flops_per_frame = step_flops
        flops_src = "xla-cost-model"
    else:
        flops_per_frame = analytic
        flops_src = "analytic"
    peak = _chip_peak()
    peak_label = "bf16"
    if quantize == "int8":
        # The decoder GEMMs run on the int8 MXU path (~2x the bf16 rate on
        # every TPU generation) — the impossibility guard must use the peak
        # of the mode it measures, or a legitimately fast int8 program
        # would be refused as a transport artifact.
        peak = peak * 2.0
        peak_label = "int8-weighted"
    mfu = fps * flops_per_frame / peak
    print(
        f"flops/frame = {flops_per_frame/1e9:.1f} GF ({flops_src}); "
        f"device = {jax.devices()[0].device_kind}; "
        f"peak({peak_label}) = {peak/1e12:.0f} TF/s; "
        f"implied MFU = {mfu*100:.1f}%",
        file=sys.stderr,
    )
    if mfu >= 1.0:
        print(
            f"ERROR: implied MFU {mfu*100:.0f}% >= 100% — physically "
            "impossible; measurement is a transport artifact. Refusing to "
            "report.",
            file=sys.stderr,
        )
        sys.exit(1)

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

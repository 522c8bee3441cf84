"""Standing TRAINING benchmark: flagship train-step ms/step on the real chip.

The serving bench (bench.py) guards inference throughput round-to-round;
this is its training twin, so training-perf regressions are visible in the
driver protocol too (VERDICT r3 "What's weak" #2). Same self-validating
measurement design as bench.py:12-30:

  * the timed unit is ONE dispatch of a `lax.scan` chain of K FULL train
    steps (value_and_grad through DINOv2+BETR, AdamW update) — the evolving
    TrainState is the cross-step data dependency, so the remote runtime
    cannot dedupe or reorder steps, and each step consumes a DISTINCT
    batch generated on-device from its own PRNG key (pre-generating 2K
    full-size batches would cost ~17 GB of HBM; the in-scan uniform RNG is
    ~0.1% of the step's FLOPs and is identical work at both chain lengths);
  * the chain is timed at K and 2K and must scale near-linearly;
  * per-step losses are fetched to host and checksummed: finite, positive,
    and ALL DISTINCT — an elided/deduped step would replicate a previous
    step's loss value (losses on distinct random batches through evolving
    params are continuous quantities; collisions do not happen honestly);
  * FLOPs/step come from XLA's cost model (a scan body is counted once),
    sanity-windowed against the analytic fwd+bwd transformer estimate, and
    the implied train MFU must be < 100% of the most generous chip peak.

Flagship geometry matches CLAUDE.md round-3 measurements: B=8, 6 frames x
256 tokens = N=1536, 12-layer BETR, bf16 compute, frozen DINOv2 encoder
(reference configs/model/transformer.yaml + opt/default.yaml).

Prints ONE JSON line: {"metric": "train_step_ms", "value", "unit",
"vs_baseline"} where vs_baseline is the implied train MFU (fraction of the
chip's bf16 speed-of-light) — the reference publishes no training
throughput, so the hardware-normalized MFU is the stable round-to-round
comparator (round-3's 87.5 ms/step prose number measured the 12-layer BETR
stack ONLY; this bench times the FULL step: DINOv2 encode, loss, backward,
AdamW update).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N_REFS = 5
SIZE = 224
BATCH = 8
K_STEPS = 8
REPEATS = 3

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


def _analytic_flops_per_step() -> float:
    """fwd + bwd FLOPs of one train step. The frozen DINOv2 encoder runs
    forward-only (1x); the trainable BETR stack runs fwd + bwd (3x — the
    standard 2x-backward matmul accounting)."""
    d = 768
    n_dino = 261
    n_betr = (N_REFS + 1) * 256
    per_layer = lambda n: 24 * n * d * d + 4 * n * n * d
    dino = 12 * per_layer(n_dino) * BATCH * (N_REFS + 1)  # per-frame encode
    betr = 12 * per_layer(n_betr) * BATCH
    return dino + 3 * betr


def _compiled_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    import argparse

    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.training.loss import Loss
    from boxdreamer_tpu.training.optim import OptimConfig
    from boxdreamer_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--encode-chunk", type=int, default=0,
                    help="sequential frozen-encoder chunk size (0 = one "
                         "batched B*T encode; see make_train_step)")
    args = ap.parse_args()

    def stage(msg):
        print(msg, file=sys.stderr, flush=True)

    model = BoxDreamer(BoxDreamerConfig())
    loss = Loss()
    optim_cfg = OptimConfig(use_warmup=False)  # constant-LR: every step real
    ks = jax.random.split(jax.random.PRNGKey(0), 4)

    T = N_REFS + 1

    def make_batch(key):
        k1, k2 = jax.random.split(key)
        return {
            "images": jax.random.uniform(
                k1, (BATCH, T, 3, SIZE, SIZE), jnp.float32
            ),
            "bbox_feat": jax.random.uniform(
                k2, (BATCH, T, 8, SIZE, SIZE), jnp.float32
            )
            * 2
            - 1,
            "query_idx": jnp.full((BATCH,), T - 1, jnp.int32),
        }

    stage("init params + optimizer...")
    sample = make_batch(ks[0])
    state, tx = create_train_state(model, optim_cfg, ks[1], sample)

    # The PRODUCTION step (boxdreamer_tpu.training.train_step) — the bench
    # must time shipped code, incl. its dispatch choices (query-only loss
    # fast path, unpacked flash attention in training). Its inner jit
    # inlines under the chain trace.
    step_fn = make_train_step(model, loss, tx, encode_chunk=args.encode_chunk)

    def train_chain(state, step_keys, rng):
        """K serialized full train steps in ONE dispatch. The TrainState
        threads through the scan — a true data dependency (params at step
        i+1 depend on grads at step i), so no step can be elided. Each
        step's batch is generated on-device from its own key."""

        def step(carry, step_key):
            state, rng = carry
            batch = make_batch(step_key)
            step_rng = jax.random.fold_in(rng, state.step)
            new_state, metrics = step_fn(state, batch, step_rng)
            return (new_state, rng), metrics["loss"]

        (state, _), losses = jax.lax.scan(step, (state, rng), step_keys)
        return state, losses

    jitted = jax.jit(train_chain, donate_argnums=(0,))

    b1 = jax.random.split(jax.random.PRNGKey(100), K_STEPS)
    b2 = jax.random.split(jax.random.PRNGKey(200), 2 * K_STEPS)
    rng = ks[2]

    stage("compiling chain K...")
    compiled1 = jitted.lower(state, b1, rng).compile()
    stage("compiling chain 2K...")
    compiled2 = jitted.lower(state, b2, rng).compile()

    # The TrainState (~1 GB params+moments) must NEVER cross the tunnel
    # inside a timed region: the chain RETURNS the final state, which is
    # threaded device-resident into the next dispatch (donation reuses the
    # buffers). Each dispatch therefore starts from different params —
    # unique work every time, so remote dedup is structurally impossible;
    # only the K per-step loss scalars are fetched.
    cur = {"state": state}

    def run(fn, keys):
        new_state, losses = fn(cur["state"], keys, rng)
        cur["state"] = new_state
        return jax.device_get(losses)

    def timed(fn, keys):
        best = float("inf")
        losses = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            losses = run(fn, keys)
            best = min(best, time.perf_counter() - t0)
        return best, losses

    stage("warmup K...")
    run(compiled1, b1)
    stage("warmup 2K...")
    run(compiled2, b2)

    stage("timing...")
    t1, losses1 = timed(compiled1, b1)
    t2, losses2 = timed(compiled2, b2)

    # --- Self-validation ---------------------------------------------------
    for name, losses, n in (
        ("K", losses1, K_STEPS),
        ("2K", losses2, 2 * K_STEPS),
    ):
        vals = [float(x) for x in losses]
        ok = (
            losses.shape == (n,)
            and bool(jnp.all(jnp.isfinite(losses)))
            and bool(jnp.all(losses > 0.0))
            and len(set(vals)) == n  # every step computed, none elided
        )
        if not ok:
            print(
                f"ERROR: chain {name} invalid: losses={losses}",
                file=sys.stderr,
            )
            sys.exit(1)
    final_step = int(jax.device_get(cur["state"].step))
    expect = (1 + REPEATS) * (K_STEPS + 2 * K_STEPS)
    if final_step != expect:
        print(
            f"ERROR: state.step {final_step} != expected {expect} — "
            "some chain dispatches did not execute.",
            file=sys.stderr,
        )
        sys.exit(1)
    print(
        f"losses K: {float(losses1[0]):.5f} -> {float(losses1[-1]):.5f}; "
        f"2K: {float(losses2[0]):.5f} -> {float(losses2[-1]):.5f}; "
        f"cumulative steps = {final_step}",
        file=sys.stderr,
    )

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

    ms_per_step = t2 * 1e3 / (2 * K_STEPS)

    chain_flops = _compiled_flops(compiled1)
    analytic = _analytic_flops_per_step()
    if 0.25 * analytic <= chain_flops <= 4.0 * analytic:
        flops_per_step = chain_flops
        flops_src = "xla-cost-model"
    else:
        flops_per_step = analytic
        flops_src = "analytic"
    peak = _chip_peak()
    mfu = (flops_per_step / (ms_per_step * 1e-3)) / peak
    print(
        f"flops/step = {flops_per_step/1e12:.2f} TF ({flops_src}); "
        f"device = {jax.devices()[0].device_kind}; "
        f"peak(bf16) = {peak/1e12:.0f} TF/s; implied train MFU = {mfu*100:.1f}%",
        file=sys.stderr,
    )
    if mfu >= 1.0:
        print(
            f"ERROR: implied MFU {mfu*100:.0f}% >= 100% — physically "
            "impossible; measurement is a transport artifact.",
            file=sys.stderr,
        )
        sys.exit(1)

    print(
        json.dumps(
            {
                "metric": "train_step_ms",
                "value": round(ms_per_step, 2),
                "unit": "ms/step",
                "vs_baseline": round(mfu, 3),  # implied train MFU
            }
        )
    )


if __name__ == "__main__":
    main()

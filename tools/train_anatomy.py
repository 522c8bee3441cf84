"""Training-step cost anatomy: cumulative chain-slope stages on the real chip.

train_bench measures the full production step (122.6 ms/step round 4); this
decomposes it so optimization effort lands on the biggest term, same
methodology as tools/stage_profile.py (distinct salt per dispatch, chained
K/2K slope, fetch-timed, params as jit ARGS).

Stages (cumulative where meaningful):
  batchgen   : on-device uniform batch synthesis only (the bench's RNG tax)
  enc_fwd    : + frozen DINOv2 encode of all B*T frames
  fwd        : full model forward (enc + embed + BETR + head), no grad
  fwd_loss   : + query-only loss
  grad       : value_and_grad of fwd_loss (no optimizer)
  full_step  : the production make_train_step (grad + clip + AdamW update)

Usage: python tools/train_anatomy.py
"""

from __future__ import annotations

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
K_STEPS = 4
T = N_REFS + 1


def make_batch(key):
    k1, k2 = jax.random.split(key)
    return {
        "images": jax.random.uniform(k1, (BATCH, T, 3, SIZE, SIZE), jnp.float32),
        "bbox_feat": jax.random.uniform(k2, (BATCH, T, 8, SIZE, SIZE), jnp.float32)
        * 2
        - 1,
        "query_idx": jnp.full((BATCH,), T - 1, jnp.int32),
    }


def chain_time(step_fn, carry0, k_steps, seed):
    """step_fn(carry, key) -> (carry, scalar). Chained via the carry."""

    @jax.jit
    def chained(carry, salt):
        def body(c, i):
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            key = jax.random.fold_in(key, salt.astype(jnp.int32))
            c, s = step_fn(c, key)
            return c, s

        c, sums = jax.lax.scan(body, carry, jnp.arange(k_steps))
        return c, jnp.sum(sums)

    c = chained.lower(carry0, jnp.float32(0.0)).compile()
    carry0 = jax.device_put(carry0)
    out = c(carry0, jnp.float32(seed))
    jax.device_get(out[1])  # warmup
    best = float("inf")
    for r in range(2):
        t0 = time.perf_counter()
        out = c(carry0, jnp.float32(seed + 1 + r))
        s = jax.device_get(out[1])
        best = min(best, time.perf_counter() - t0)
        assert jnp.isfinite(s), s
    return best


def slope_ms(step_fn, carry0, seed):
    t1 = chain_time(step_fn, carry0, K_STEPS, seed)
    t2 = chain_time(step_fn, carry0, 2 * K_STEPS, seed + 500)
    return (t2 - t1) / K_STEPS * 1e3


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx
    from boxdreamer_tpu.models.dinov2 import DinoViT
    from boxdreamer_tpu.training.loss import Loss
    from boxdreamer_tpu.training.optim import OptimConfig
    from boxdreamer_tpu.training.train_step import (
        create_train_state,
        make_train_step,
    )

    model = BoxDreamer(BoxDreamerConfig())
    loss = Loss()
    optim_cfg = OptimConfig(use_warmup=False)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    sample = make_batch(ks[0])
    state, tx = create_train_state(model, optim_cfg, ks[1], sample)
    params = state.params
    dino = DinoViT(model.config.dino)
    dino_params = {"params": params["params"]["encoder"]}
    camera_mask = camera_mask_from_query_idx(sample["query_idx"], T)
    step_fn = make_train_step(model, loss, tx)

    def loss_of(params, batch, rng):
        pred = model.apply(
            params,
            batch["images"],
            batch["bbox_feat"],
            camera_mask,
            deterministic=False,
            rngs={"dropout": rng},
        )
        B = pred.shape[0]
        q = batch["query_idx"].reshape(B, 1, 1, 1, 1)
        gt_q = jnp.take_along_axis(batch["bbox_feat"], q, axis=1)
        total, _ = loss(
            {
                "pred_bbox": pred[:, None],
                "bbox_feat": gt_q,
                "camera_mask": jnp.ones((B, 1), dtype=bool),
            }
        )
        return total, pred

    # --- stage step functions (carry = params or TrainState; the returned
    # scalar feeds the next step's salt only through the scan carry chain in
    # chain_time, keeping stages serialized) -------------------------------
    def st_batchgen(c, key):
        b = make_batch(key)
        return c, jnp.sum(b["images"][0, 0, 0, 0]) + jnp.sum(b["bbox_feat"][0, 0, 0, 0])

    def st_enc_fwd(dp, key):
        # dp (the encoder params) rides the CARRY — closure-captured weights
        # bake into the HLO and 413 the remote compile endpoint.
        b = make_batch(key)
        flat = b["images"].reshape(BATCH * T, 3, SIZE, SIZE)
        toks = dino.apply(dp, flat)
        return dp, jnp.sum(toks[:, 0, :8].astype(jnp.float32))

    def st_fwd(params, key):
        b = make_batch(key)
        pred = model.apply(
            params, b["images"], b["bbox_feat"], camera_mask,
            deterministic=False, rngs={"dropout": key},
        )
        return params, jnp.sum(pred[:, :, :2, :2].astype(jnp.float32))

    def st_fwd_loss(params, key):
        b = make_batch(key)
        total, _ = loss_of(params, b, key)
        return params, total

    def st_grad(params, key):
        b = make_batch(key)
        (total, _), grads = jax.value_and_grad(
            lambda p: loss_of(p, b, key), has_aux=True
        )(params)
        # Fold a grad leaf into the checksum so the backward is live.
        leaf = jax.tree_util.tree_leaves(grads)[0]
        return params, total + jnp.sum(leaf.astype(jnp.float32)) * 1e-20

    def st_full(st, key):
        b = make_batch(key)
        new_state, metrics = step_fn(st, b, key)
        return new_state, metrics["loss"]

    stages = [
        ("batchgen", st_batchgen, jnp.float32(0.0)),
        ("enc_fwd", st_enc_fwd, dino_params),
        ("fwd", st_fwd, params),
        ("fwd_loss", st_fwd_loss, params),
        ("grad", st_grad, params),
        ("full_step", st_full, state),
    ]
    results = {}
    prev = 0.0
    for name, fn, carry in stages:
        print(f"measuring {name}...", file=sys.stderr, flush=True)
        s = slope_ms(fn, carry, seed=hash(name) % 997)
        results[name] = {"ms_per_step": round(s, 2), "delta_ms": round(s - prev, 2)}
        print(f"  {name}: {s:.2f} ms/step (delta {s - prev:+.2f})",
              file=sys.stderr, flush=True)
        prev = s

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "results": results}))


if __name__ == "__main__":
    main()

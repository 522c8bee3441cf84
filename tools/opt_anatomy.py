"""Optimizer-update cost anatomy on the real chip.

tools/train_anatomy.py puts clip+AdamW+apply at ~16.7 ms/step — ~3x the
HBM-bound ideal for 85M trainable params. This isolates where it goes:

  adamw_chain : the production tx (clip_by_global_norm + multi_transform
                {adamw, set_to_zero}) + optax.apply_updates — what
                make_train_step runs.
  no_clip     : same without the global-norm clip (tests the two-pass +
                scalar-join cost of clipping).
  no_mt       : plain optax.adamw over the TRAINABLE subtree only (tests
                multi_transform partition overhead + frozen-zero traffic).
  fused       : hand-fused single tree_map AdamW update (m, v, p in one
                pass per leaf) — the speed-of-light reference.

Grads are synthesized once on device and perturbed per step by the carry
(distinct work each step, chain-serialized). Params/moments ride the scan
carry; nothing big is closure-captured (remote-compile 413 gotcha).

Usage: python tools/opt_anatomy.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

K_STEPS = 16


def chain_time(step_fn, carry0, k_steps, seed):
    @jax.jit
    def chained(carry, salt):
        def body(c, i):
            return step_fn(c, salt + i.astype(jnp.float32))

        c, sums = jax.lax.scan(body, carry, jnp.arange(k_steps))
        return c, jnp.sum(sums)

    c = chained.lower(carry0, jnp.float32(0.0)).compile()
    carry0 = jax.device_put(carry0)
    s = jax.device_get(c(carry0, jnp.float32(seed))[1])  # warmup
    assert jnp.isfinite(s), s
    best = float("inf")
    for r in range(2):
        t0 = time.perf_counter()
        s = jax.device_get(c(carry0, jnp.float32(seed + 1 + r))[1])
        best = min(best, time.perf_counter() - t0)
        assert jnp.isfinite(s), s
    return best


def slope_ms(step_fn, carry0, seed):
    t1 = chain_time(step_fn, carry0, K_STEPS, seed)
    t2 = chain_time(step_fn, carry0, 2 * K_STEPS, seed + 900)
    return (t2 - t1) / K_STEPS * 1e3


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.training.optim import OptimConfig, build_optimizer
    from boxdreamer_tpu.training.train_step import create_train_state

    model = BoxDreamer(BoxDreamerConfig())
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    B, T, S = 8, 6, 224
    sample = {
        "images": jax.random.uniform(ks[0], (B, T, 3, S, S)),
        "bbox_feat": jax.random.uniform(ks[1], (B, T, 8, S, S)) * 2 - 1,
        "query_idx": jnp.full((B,), T - 1, jnp.int32),
    }
    optim_cfg = OptimConfig(use_warmup=False)
    state, tx = create_train_state(model, optim_cfg, ks[2], sample)
    params = state.params

    # Synthetic gradient tree: same structure/dtypes as params.
    grads0 = jax.tree_util.tree_map(
        lambda p: (jnp.arange(p.size, dtype=jnp.float32) % 997).reshape(p.shape)
        * 1e-4,
        params,
    )
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"tree: {n_leaves} leaves, {n_params/1e6:.1f} M params",
          file=sys.stderr, flush=True)

    def perturb(grads, salt):
        # O(1) leaves touched: enough to make every step's update distinct.
        return jax.tree_util.tree_map(lambda g: g * (1.0 + salt * 1e-12), grads)

    results = {}

    # 1. Production chain.
    def upd_chain(p, g, o):
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2

    # 2. No clip.
    cfg_noclip = OptimConfig(use_warmup=False, grad_clip_norm=0.0)
    tx_noclip = build_optimizer(cfg_noclip, params)

    def upd_noclip(p, g, o):
        u, o2 = tx_noclip.update(g, o, p)
        return optax.apply_updates(p, u), o2

    # 3. Plain adamw, trainable subtree only (frozen encoder excluded from
    # the tree entirely — no zero-grad traffic, no multi_transform).
    trainable = {"params": {k: v for k, v in params["params"].items()
                            if k != "encoder"}}
    tg0 = {"params": {k: v for k, v in grads0["params"].items()
                      if k != "encoder"}}
    tx_plain = optax.adamw(optim_cfg.lr, weight_decay=optim_cfg.adamw_decay)

    def upd_plain(p, g, o):
        u, o2 = tx_plain.update(g, o, p)
        return optax.apply_updates(p, u), o2

    # 4. Hand-fused AdamW (single pass per leaf; no wd mask, no clip).
    b1, b2, eps, lr, wd = 0.9, 0.999, 1e-8, optim_cfg.lr, optim_cfg.adamw_decay

    def upd_fused(p, g, mv):
        m, v, t = mv
        t = t + 1.0
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t

        def leaf(p, g, m, v):
            m2 = b1 * m + (1 - b1) * g
            v2 = b2 * v + (1 - b2) * g * g
            upd = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps) + wd * p
            return p - lr * upd, m2, v2

        out = jax.tree_util.tree_map(leaf, p, g, m, v)
        p2 = jax.tree_util.tree_map(lambda o: o[0], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        m2 = jax.tree_util.tree_map(lambda o: o[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        v2 = jax.tree_util.tree_map(lambda o: o[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return p2, (m2, v2, t)

    zeros = jax.tree_util.tree_map(jnp.zeros_like, trainable)

    cases = [
        ("adamw_chain", upd_chain, tx.init(params), params,
         jax.device_put(grads0)),
        ("no_clip", upd_noclip, tx_noclip.init(params), params,
         jax.device_put(grads0)),
        ("no_mt_trainable", upd_plain, tx_plain.init(trainable), trainable,
         jax.device_put(tg0)),
        ("fused_trainable", upd_fused,
         (zeros, jax.tree_util.tree_map(jnp.zeros_like, trainable),
          jnp.float32(0.0)), trainable, jax.device_put(tg0)),
    ]

    for name, fn, opt0, p0, g0 in cases:

        def step(carry, salt, fn=fn):
            # Grads ride the CARRY (closure-captured arrays bake into the
            # HLO and 413 the remote compile endpoint).
            pp, oo, gbase = carry
            gg = perturb(gbase, salt)
            p2, o2 = fn(pp, gg, oo)
            leaf = jax.tree_util.tree_leaves(p2)[0]
            return (p2, o2, gbase), jnp.sum(leaf.astype(jnp.float32))

        print(f"measuring {name}...", file=sys.stderr, flush=True)
        s = slope_ms(step, (p0, opt0, g0), seed=hash(name) % 997)
        results[name] = round(s, 2)
        print(f"  {name}: {s:.2f} ms/update", file=sys.stderr, flush=True)

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "n_params_M": round(n_params / 1e6, 1),
                      "results": results}))


if __name__ == "__main__":
    main()

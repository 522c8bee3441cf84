"""Dense-reference-mode on-chip measurement (chain-slope, fetch-timed).

VERDICT r3 weak-item 3: the dense multi-round decode (models/dense.py), the
single-shot long-sequence decode (the path ring/SP shards), and the filter
stage were CPU-mesh-tested but never timed on the real chip. This tool
measures them with the same defenses as bench.py / tools/attend_anatomy.py:
each timed dispatch carries a distinct salt (remote dedup), chains K and 2K
steps through a data dependency, and times to a FETCHED value.

Configurations (reference dense eval, configs/model/transformer.yaml:25-34 +
src/models/utils/dense_processing.py:8-158):
  * filter+single-shot: 25 refs DINO-filtered to top-5, one 6-frame decode
    — the production dense default (filter_enable=true, multi_round=false).
  * multi-round: 25 refs in 5 sub-batches of 5(+query), pooled-proposal
    RANSAC (multi_round=true, no filter).
  * multi-round mem-friendly: same via lax.map (dense_mem_friendly=true).
  * single-shot long-seq: ALL 25 refs in one decoder pass (26x256 = 6656
    tokens) — the token count that sequence parallelism would shard; its
    single-device cost anchors the sp_min_len threshold.

Usage: python tools/dense_bench.py [--batch 8] [--refs 25]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

SIZE = 224


def make_batch(key, B, n_refs):
    T = n_refs + 1
    ks = jax.random.split(key, 4)
    return {
        "images": jax.random.uniform(ks[0], (B, T, 3, SIZE, SIZE)),
        "bbox_feat": jax.random.uniform(ks[1], (B, T, 8, SIZE, SIZE)) * 2 - 1,
        "non_ndc_intrinsics": jnp.broadcast_to(
            jnp.array([[900.0, 0, 112.0], [0, 900.0, 112.0], [0, 0, 1.0]]),
            (B, T, 3, 3),
        ),
        "bbox_3d": jax.random.normal(ks[2], (B, T, 8, 3)) * 0.1,
    }


def chain_time(fn, params, batch, k_steps, seed):
    """Chained dispatch: the pose checksum of step i perturbs step i+1's
    images at 1e-20 (numerically inert, serializing); outer salt varies
    per timed call so no two dispatches are byte-identical.

    params is a jit ARGUMENT, never a closure capture — captured weights
    bake into the HLO and the axon remote-compile endpoint chokes on the
    payload (CLAUDE.md stage_profile gotcha)."""

    @jax.jit
    def chained(params, batch, salt):
        def body(carry, _):
            csum = carry
            b = dict(batch)
            b["images"] = batch["images"] + (salt + csum) * 1e-20
            out = fn(params, b)
            return jnp.sum(out["pred_poses"].astype(jnp.float32)), None

        csum, _ = jax.lax.scan(
            body, jnp.float32(0.0), None, length=k_steps
        )
        return csum

    c = chained.lower(params, batch, jnp.float32(0.0)).compile()
    params = jax.device_put(params)
    batch = jax.device_put(batch)
    jax.device_get(c(params, batch, jnp.float32(seed)))  # warmup
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(c(params, batch, jnp.float32(seed + r + 1)))
        best = min(best, time.perf_counter() - t0)
        assert jnp.isfinite(out), out
    return best


def slope_ms(fn, params, batch, seed):
    t1 = chain_time(fn, params, batch, 2, seed)
    t2 = chain_time(fn, params, batch, 4, seed + 100)
    return (t2 - t1) / 2 * 1e3, t1 * 1e3, t2 * 1e3


def main():
    from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig
    from boxdreamer_tpu.models.dense import DenseConfig, dense_predict

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--refs", type=int, default=25)
    p.add_argument("--int8", action="store_true",
                   help="decoder int8 serving mode (BETRConfig.quantize)")
    p.add_argument("--cached-store", default="bf16", choices=["bf16", "int8"],
                   help="token-cache storage for the cachedrefs config "
                        "(int8 = 4.1x smaller DB, dequant at entry)")
    p.add_argument("--only", default=None,
                   help="substring filter on configuration names")
    args = p.parse_args()
    B, R = args.batch, args.refs

    import dataclasses

    cfg = BoxDreamerConfig()
    if args.int8:
        cfg = dataclasses.replace(
            cfg, betr=dataclasses.replace(cfg.betr, quantize="int8")
        )
    model = BoxDreamer(cfg)
    T0 = 6
    init = make_batch(jax.random.PRNGKey(0), 1, T0 - 1)
    mask = jnp.zeros((1, T0), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(1), init["images"], init["bbox_feat"], mask
    )
    batch = make_batch(jax.random.PRNGKey(2), B, R)

    configs = {
        "filter_singleshot": DenseConfig(
            enable=True, filter_enable=True, filter="dino", filter_topk=5,
            multi_round=False,
        ),
        "multi_round": DenseConfig(
            enable=True, filter_enable=False, multi_round=True,
            sub_batch_size=5,
        ),
        "multi_round_memfriendly": DenseConfig(
            enable=True, filter_enable=False, multi_round=True,
            sub_batch_size=5, dense_mem_friendly=True,
        ),
        "singleshot_longseq": DenseConfig(
            enable=True, filter_enable=False, multi_round=False,
        ),
        # Serving-side DB caching (models/dense.py encode_dense_references):
        # the 25-ref DB is encoded ONCE outside the chain; per query only
        # the B query frames hit the encoder. Exactness pinned by
        # tests/models/test_dense.py::test_dense_cached_ref_tokens_exact.
        "filter_singleshot_cachedrefs": DenseConfig(
            enable=True, filter_enable=True, filter="dino", filter_topk=5,
            multi_round=False,
        ),
    }
    results = {}
    for name, dcfg in configs.items():
        if args.only and args.only not in name:
            continue
        # The long-sequence single shot is the SP-shardable path; run it at
        # batch 1 (its per-query attention is already (26*256)^2).
        b = make_batch(jax.random.PRNGKey(3), 1, R) if "longseq" in name else batch
        b = dict(b)
        if "cachedrefs" in name:
            from boxdreamer_tpu.models.dense import encode_dense_references

            # Shared DB: encode row 0's refs once; tokens ride the batch
            # dict as a jit ARG (never a closure — remote-compile 413).
            b["ref_tokens"] = jax.jit(
                lambda pp, im: encode_dense_references(
                    model, pp, im, store=args.cached_store
                )
            )(params, b["images"][0, :-1])

        def run_fn(pp, bb, d=dcfg):
            bb = dict(bb)
            toks = bb.pop("ref_tokens", None)
            return dense_predict(model, pp, bb, d, ref_tokens=toks)

        print(f"measuring {name}...", file=sys.stderr, flush=True)
        try:
            s, t1, t2 = slope_ms(
                run_fn,
                params,
                b,
                seed=zlib.crc32(name.encode()) % 1000,
            )
            nb = b["images"].shape[0]
            results[name] = {
                "ms_per_batch": round(s, 2),
                "ms_per_query": round(s / nb, 3),
                "batch": nb,
                "refs": R,
                "chainK_ms": round(t1, 1),
                "chain2K_ms": round(t2, 1),
            }
            print(f"  {name}: {s:.1f} ms/batch ({s/nb:.2f} ms/query)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report and continue
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"  {name}: FAILED {e}", file=sys.stderr)

    print(json.dumps({"device": jax.devices()[0].device_kind,
                      "results": results}))


if __name__ == "__main__":
    main()

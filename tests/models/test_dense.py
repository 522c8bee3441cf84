import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.models import dense as D

TINY = BoxDreamerConfig(
    betr=BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    ),
    dino=DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
        dtype="float32",
    ),
    pnp_iters=3,
)


def make_batch(key, B=1, T=9, size=28):
    ks = jax.random.split(key, 4)
    return {
        "images": jax.random.uniform(ks[0], (B, T, 3, size, size)),
        "bbox_feat": jax.random.uniform(ks[1], (B, T, 8, size, size)) * 2 - 1,
        "bbox_3d": jnp.broadcast_to(
            jax.random.normal(ks[2], (8, 3)) * 0.1, (B, T, 8, 3)
        ),
        "non_ndc_intrinsics": jnp.broadcast_to(
            jnp.array([[100.0, 0, 14.0], [0, 100.0, 14.0], [0, 0, 1.0]]),
            (B, T, 3, 3),
        ),
        "poses": jnp.broadcast_to(jnp.eye(4), (B, T, 4, 4)),
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = BoxDreamer(TINY)
    batch = make_batch(jax.random.PRNGKey(0))
    mask = jnp.zeros((1, 9), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(1), batch["images"], batch["bbox_feat"], mask
    )
    return model, params


def test_foreground_mask_thresholding():
    imgs = jnp.zeros((2, 3, 28, 28)).at[:, :, :14, :].set(1.0)
    m = D.foreground_mask(imgs, grid=2)
    assert m.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(m), [[1, 1, 0, 0]] * 2)


def test_dino_similarity_prefers_similar_features():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 4, 16))
    refs = jnp.stack([q[0] + 0.01, -q[0]], axis=0)[None]  # similar, dissimilar
    imgs = jnp.ones((1, 3, 28, 28))
    ref_imgs = jnp.ones((1, 2, 3, 28, 28))
    s = D.dino_similarity(refs, q, ref_imgs, imgs)
    assert s.shape == (1, 2)
    assert float(s[0, 0]) > float(s[0, 1])


def test_gt_neighbor_score_identity_best():
    poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4, 4))
    far = poses.at[0, 1, :3, 3].set(jnp.array([5.0, 0, 0]))
    mask = jnp.zeros((1, 4), dtype=bool).at[:, 3].set(True)
    score = D.gt_neighbor_score(far, mask)
    assert score.shape == (1, 3)
    # Ref 1 (translated far) must score lowest.
    assert float(score[0, 1]) == 0.0


def test_topk_gather_shapes():
    scores = jnp.array([[0.1, 0.9, 0.5, 0.3]])
    arr = jnp.arange(4 * 2).reshape(1, 4, 2).astype(jnp.float32)
    idx, g = D.topk_gather(scores, 2, arr)
    assert idx.shape == (1, 2)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 2])
    np.testing.assert_allclose(np.asarray(g[0, 0]), [2, 3])


def test_sub_batchify_layout():
    B, N = 1, 7
    bf = jnp.arange(N, dtype=jnp.float32).reshape(1, N, 1, 1, 1)
    bf = jnp.broadcast_to(bf, (1, N, 2, 4, 4))
    tk = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32).reshape(1, N, 1, 1), (1, N, 3, 5)
    )
    q = jnp.full((1, 3, 5), -1.0)
    nbf, ntk, cm = D.sub_batchify(bf, tk, q, sub_batch_size=3)
    assert nbf.shape == (1, 3, 4, 2, 4, 4)  # ceil(7/3)=3 groups of 3+1
    assert ntk.shape == (1, 3, 4, 3, 5)
    # Group 0 holds refs 0..2, group 2 holds ref 6 + zero padding.
    np.testing.assert_allclose(np.asarray(nbf[0, 0, 0, 0, 0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(nbf[0, 2, 0, 0, 0, 0]), 6.0)
    np.testing.assert_allclose(np.asarray(nbf[0, 2, 1]), 0.0)  # padding
    # Query token last in every group.
    np.testing.assert_allclose(np.asarray(ntk[0, :, -1]), -1.0)
    assert bool(cm[0, 0, -1]) and not bool(cm[0, 0, 0])


def test_fetch_neighbors_by_pose_similarity():
    refs = jnp.broadcast_to(jnp.eye(4), (1, 5, 4, 4))
    refs = refs.at[0, 2, :3, 3].set(jnp.array([0.01, 0, 0]))
    refs = refs.at[0, 4, :3, 3].set(jnp.array([9.0, 0, 0]))
    pred = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    idx = D.fetch_neighbors_by_pose_similarity(refs, pred, topk=3)
    assert 4 not in np.asarray(idx[0]).tolist()


def test_dense_predict_single_round(model_and_params):
    model, params = model_and_params
    batch = make_batch(jax.random.PRNGKey(2))
    cfg = D.DenseConfig(enable=True, filter_topk=4, multi_round=False)
    out = D.dense_predict(model, params, batch, cfg)
    assert out["pred_poses"].shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()


def test_dense_predict_multi_round(model_and_params):
    model, params = model_and_params
    batch = make_batch(jax.random.PRNGKey(3))
    cfg = D.DenseConfig(
        enable=True, filter_enable=False, multi_round=True, sub_batch_size=3,
        ransac_hypotheses=8,
    )
    out = D.dense_predict(model, params, batch, cfg)
    assert out["pred_poses"].shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()


def test_dense_predict_fine_level(model_and_params):
    model, params = model_and_params
    batch = make_batch(jax.random.PRNGKey(4))
    cfg = D.DenseConfig(
        enable=True, filter_enable=False, multi_round=True, sub_batch_size=4,
        fine_level=True, fine_topk=3, ransac_hypotheses=8,
    )
    out = D.dense_predict(model, params, batch, cfg)
    assert out["pred_poses"].shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()


def test_dense_predict_mem_friendly(model_and_params):
    model, params = model_and_params
    batch = make_batch(jax.random.PRNGKey(5))
    cfg = D.DenseConfig(
        enable=True, filter_enable=False, multi_round=True, sub_batch_size=3,
        dense_mem_friendly=True, ransac_hypotheses=8,
    )
    out = D.dense_predict(model, params, batch, cfg)
    assert out["pred_poses"].shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out["pred_poses"])).all()
    # Must match the non-mem-friendly path exactly (same math, different
    # scheduling).
    cfg2 = D.DenseConfig(
        enable=True, filter_enable=False, multi_round=True, sub_batch_size=3,
        dense_mem_friendly=False, ransac_hypotheses=8,
    )
    out2 = D.dense_predict(model, params, batch, cfg2)
    np.testing.assert_allclose(
        np.asarray(out["pred_poses"]), np.asarray(out2["pred_poses"]), atol=1e-4
    )


def test_dense_predict_gt_neighbor_filter(model_and_params):
    model, params = model_and_params
    batch = make_batch(jax.random.PRNGKey(6))
    cfg = D.DenseConfig(enable=True, filter="gt-neighbor", filter_topk=4)
    out = D.dense_predict(model, params, batch, cfg)
    assert out["pred_poses"].shape == (1, 4, 4)


def test_betr_diff_emb_path():
    import dataclasses as _dc

    from boxdreamer_tpu.models import BETR, BETRConfig

    cfg = BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32", use_pretrained=False, diff_emb=True,
    )
    model = BETR(cfg)
    B, T = 1, 2
    pose_feat = jax.random.uniform(jax.random.PRNGKey(0), (B, T, 8, 28, 28))
    rgbs = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 3, 28, 28))
    masks = jnp.zeros((B, T), dtype=bool).at[:, 1].set(True)
    params = model.init(jax.random.PRNGKey(2), pose_feat, rgbs, masks, None)
    assert "input_query_rgb_emb" in params["params"]
    assert "input_ref_emb" in params["params"]
    out = model.apply(params, pose_feat, rgbs, masks, None)
    assert out.shape == (B, 8, 28, 28)


def test_dense_defaults_pinned_by_chip_measurement():
    """Default DenseConfig must stay the measured-fastest dense configuration.

    tools/dense_bench.py (v5e, batch 8, 25 refs, chain-slope fetch-timed,
    round 4) measured per-query decode cost:
      filter+single-shot 19.1 ms < multi-round 36.7 ms
      < multi-round mem-friendly 38.7 ms; single-shot over all 25 refs
      (6656 tokens) runs in 54.8 ms on ONE chip, so ring/SP sharding below
      sp_min_len=4096 tokens would be ppermute-latency-dominated.
    Changing any of these defaults requires re-running dense_bench and
    updating the DenseConfig docstring with the new numbers.
    """
    cfg = D.DenseConfig()
    assert cfg.filter_enable and cfg.filter == "dino" and cfg.filter_topk == 5
    assert not cfg.multi_round
    assert not cfg.dense_mem_friendly
    assert cfg.sp_min_len == 4096


def test_dense_cached_ref_tokens_exact(model_and_params):
    """dense_predict with precomputed reference tokens
    (encode_dense_references) must equal the recompute path exactly —
    the frozen encoder is deterministic, so serving-side DB caching is a
    pure cost optimization."""
    model, params = model_and_params
    B, R = 2, 6
    batch = make_batch(jax.random.PRNGKey(11), B, R + 1)
    cfg = D.DenseConfig(enable=True, filter_enable=True, filter="dino",
                        filter_topk=3, multi_round=False)

    out = D.dense_predict(model, params, batch, cfg)

    # Per-batch-row tokens (B, N, P, C).
    imgs = batch["images"]
    flat = imgs[:, :R].reshape((B * R,) + imgs.shape[2:])
    toks = D.encode_dense_references(model, params, flat)
    toks = toks.reshape(B, R, toks.shape[1], toks.shape[2])
    out_cached = D.dense_predict(model, params, batch, cfg, ref_tokens=toks)
    np.testing.assert_allclose(
        np.asarray(out_cached["pred_poses"]), np.asarray(out["pred_poses"]),
        rtol=1e-5, atol=1e-6,
    )

    # Shared-DB (N, P, C) broadcast: all batch rows share row 0's refs.
    shared = toks[0]
    out_shared = D.dense_predict(model, params, batch, cfg, ref_tokens=shared)
    # Row 0 of the shared run must match the per-row cached run's row 0
    # (same refs, same query).
    np.testing.assert_allclose(
        np.asarray(out_shared["pred_poses"][0]),
        np.asarray(out_cached["pred_poses"][0]),
        rtol=1e-5, atol=1e-6,
    )


def test_dense_int8_token_cache(model_and_params):
    """store='int8' token cache: 4.1x smaller DB, dequantized at
    dense_predict entry; decoded keypoints must stay close to the bf16
    cache (per-row symmetric int8, ~0.4% rel err per token)."""
    model, params = model_and_params
    B, R = 2, 6
    batch = make_batch(jax.random.PRNGKey(11), B, R + 1)
    cfg = D.DenseConfig(enable=True, filter_enable=True, filter="dino",
                        filter_topk=3, multi_round=False)

    shared_imgs = batch["images"][0, :R]
    bf16_cache = D.encode_dense_references(model, params, shared_imgs)
    q_cache = D.encode_dense_references(model, params, shared_imgs,
                                        store="int8")
    assert q_cache["int8"].dtype == np.int8
    deq = D._materialize_ref_tokens(q_cache)
    rel = float(
        np.abs(np.asarray(deq, np.float32) - np.asarray(bf16_cache, np.float32)).max()
        / np.abs(np.asarray(bf16_cache, np.float32)).max()
    )
    assert rel < 0.02, rel

    out_bf16 = D.dense_predict(model, params, batch, cfg, ref_tokens=bf16_cache)
    out_int8 = D.dense_predict(model, params, batch, cfg, ref_tokens=q_cache)
    np.testing.assert_allclose(
        np.asarray(out_int8["pred_kpts_2d"]),
        np.asarray(out_bf16["pred_kpts_2d"]),
        atol=2.0,  # pixels
    )

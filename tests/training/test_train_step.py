import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.training import loss as loss_lib
from boxdreamer_tpu.training.optim import OptimConfig, build_schedule
from boxdreamer_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    scatter_query_prediction,
)
from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx

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


def tiny_batch(key, B=2, T=3):
    k = jax.random.split(key, 4)
    return {
        "images": jax.random.uniform(k[0], (B, T, 3, 28, 28)),
        "bbox_feat": jax.random.uniform(k[1], (B, T, 8, 28, 28)) * 2 - 1,
        "query_idx": jnp.array([1] * B),
        "bbox_3d": jnp.broadcast_to(
            jax.random.normal(k[2], (8, 3)) * 0.1, (B, T, 8, 3)
        ),
        "non_ndc_intrinsics": jnp.broadcast_to(
            jnp.array([[100.0, 0, 14.0], [0, 100.0, 14.0], [0, 0, 1.0]]),
            (B, T, 3, 3),
        ),
    }


def test_scatter_query_prediction():
    bbox = jnp.zeros((2, 3, 8, 4, 4))
    pred = jnp.ones((2, 8, 4, 4))
    mask = camera_mask_from_query_idx(jnp.array([0, 2]), 3)
    out = scatter_query_prediction(bbox, pred, mask)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(out[0, 1]), 0.0)
    np.testing.assert_allclose(np.asarray(out[1, 2]), 1.0)


def test_schedule_warmup_then_decay():
    cfg = OptimConfig(lr=1e-3, warmup_steps=100, cosa_tmax=1000)
    s = build_schedule(cfg)
    assert float(s(0)) < 1e-8
    np.testing.assert_allclose(float(s(50)), 0.5e-3, rtol=1e-3)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-3)
    assert float(s(1100)) <= float(s(100))


def test_train_step_reduces_loss_and_freezes_encoder():
    model = BoxDreamer(TINY)
    batch = tiny_batch(jax.random.PRNGKey(0))
    optim_cfg = OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant")
    state, tx = create_train_state(model, optim_cfg, jax.random.PRNGKey(1), batch)
    step = make_train_step(model, loss_lib.Loss(), tx)

    # Snapshot to host before stepping — the train step donates the state.
    enc_before = [
        np.asarray(l) for l in jax.tree_util.tree_leaves(state.params["params"]["encoder"])
    ]
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i + 10))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    enc_after = jax.tree_util.tree_leaves(state.params["params"]["encoder"])
    for a, b in zip(enc_before, enc_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.step) == 5


def test_eval_step_outputs():
    model = BoxDreamer(TINY)
    batch = tiny_batch(jax.random.PRNGKey(2))
    optim_cfg = OptimConfig(use_warmup=False, scheduler="constant")
    state, _ = create_train_state(model, optim_cfg, jax.random.PRNGKey(3), batch)
    eval_step = make_eval_step(model, loss_lib.Loss())
    out, metrics = eval_step(state.params, batch)
    assert out["pred_poses"].shape == (2, 4, 4)
    assert np.isfinite(float(metrics["val_loss"]))


def test_device_bbox_feat_generation():
    """Training with only bbox_proj_pix (device-side heatmap generation)
    must match training with host-precomputed bbox_feat."""
    from boxdreamer_tpu.data.preprocess import make_heatmap_features_np
    from boxdreamer_tpu.training.loss import Loss as _Loss
    from boxdreamer_tpu.training.train_step import ensure_bbox_feat

    model = BoxDreamer(TINY)
    B, T, S = 1, 2, 28
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    proj = jax.random.uniform(ks[0], (B, T, 8, 2), minval=4.0, maxval=24.0)
    host_feat = jnp.asarray(make_heatmap_features_np(np.asarray(proj), S, S))
    batch_device = {
        "images": jax.random.uniform(ks[1], (B, T, 3, S, S)),
        "query_idx": jnp.array([T - 1] * B),
        "bbox_proj_pix": proj,
    }
    filled = ensure_bbox_feat(batch_device, model)
    np.testing.assert_allclose(
        np.asarray(filled["bbox_feat"]), np.asarray(host_feat), atol=1e-4
    )

    # Train step runs without host bbox_feat.
    state, tx = create_train_state(
        model, OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant"),
        ks[2], filled,
    )
    step = make_train_step(model, _Loss(), tx)
    state, m = step(state, batch_device, jax.random.PRNGKey(9))
    assert np.isfinite(float(m["loss"]))


def test_query_only_loss_fast_path_exact():
    """The train step's query-only loss fast path (Loss.query_frame_only)
    must equal the scatter-into-full-tensor composition bit-for-bit in f32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx
    from boxdreamer_tpu.training.loss import Loss, LossTerm
    from boxdreamer_tpu.training.train_step import scatter_query_prediction

    B, T, c, S = 3, 4, 8, 16
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    bbox_feat = jax.random.uniform(ks[0], (B, T, c, S, S)) * 2 - 1
    pred = jax.random.uniform(ks[1], (B, c, S, S)) * 2 - 1
    query_idx = jnp.array([1, 3, 0])
    cmask = camera_mask_from_query_idx(query_idx, T)
    loss = Loss([LossTerm()])
    assert loss.query_frame_only

    full, _ = loss(
        {
            "pred_bbox": scatter_query_prediction(bbox_feat, pred, cmask),
            "bbox_feat": bbox_feat,
            "camera_mask": cmask,
        }
    )
    q = query_idx.reshape(B, 1, 1, 1, 1)
    fast, _ = loss(
        {
            "pred_bbox": pred[:, None],
            "bbox_feat": jnp.take_along_axis(bbox_feat, q, axis=1),
            "camera_mask": jnp.ones((B, 1), dtype=bool),
        }
    )
    np.testing.assert_allclose(float(fast), float(full), rtol=1e-6)

    # Non-default terms must NOT take the fast path.
    assert not Loss([LossTerm(weight=(1.0, 0.5))]).query_frame_only
    assert not Loss([LossTerm(type="focal")]).query_frame_only


def test_chunked_encode_train_step_exact():
    """encode_chunk runs the frozen encoder in sequential lax.map chunks
    (HBM-superlinearity workaround, make_train_step docstring) — the loss
    is bit-identical and params match to f32 reassociation."""
    import numpy as np

    from boxdreamer_tpu.models import (
        BETRConfig, BoxDreamer, BoxDreamerConfig, DinoViTConfig,
    )
    from boxdreamer_tpu.training.loss import Loss
    from boxdreamer_tpu.training.optim import OptimConfig
    from boxdreamer_tpu.training.train_step import (
        create_train_state, make_train_step,
    )

    S = 28
    model = BoxDreamer(
        BoxDreamerConfig(
            betr=BETRConfig(d_model=32, nhead=2, num_decoder_layers=1,
                            patch_size=14, img_size=S, dtype="float32"),
            dino=DinoViTConfig(img_size=S, patch_size=14, embed_dim=32,
                               depth=1, num_heads=2, dtype="float32"),
            pnp_iters=3,
        )
    )
    rng = np.random.default_rng(0)
    B, T = 2, 3
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (B, T, 3, S, S)), jnp.float32),
        "bbox_feat": jnp.asarray(
            rng.uniform(-1, 1, (B, T, 8, S, S)), jnp.float32
        ),
        "query_idx": jnp.full((B,), T - 1, jnp.int32),
    }
    state, tx = create_train_state(
        model, OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant"),
        jax.random.PRNGKey(0), batch,
    )
    s0 = make_train_step(model, Loss(), tx, deterministic=True)
    s1 = make_train_step(model, Loss(), tx, deterministic=True, encode_chunk=2)
    k = jax.random.PRNGKey(1)
    cp = lambda s: jax.tree_util.tree_map(jnp.copy, s)  # donated argnums
    n0, m0 = s0(cp(state), batch, k)
    n1, m1 = s1(cp(state), batch, k)
    # f32 reassociation only (lax.map chunking reorders reductions)
    assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-6
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), n0.params, n1.params
    )
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-4

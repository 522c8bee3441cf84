

def test_cached_ref_fuse_matches_uncached():
    """predict_query with cached fused reference tokens must equal the
    uncached path exactly (same program, reference embedding hoisted)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boxdreamer_tpu.models import (
        BETRConfig, BoxDreamer, BoxDreamerConfig, DinoViTConfig,
    )
    from boxdreamer_tpu.models.predictor import decoder_embed, predict_query

    cfg = BoxDreamerConfig(
        betr=BETRConfig(d_model=32, nhead=2, num_decoder_layers=2,
                        patch_size=14, img_size=28, dtype="float32"),
        dino=DinoViTConfig(img_size=28, patch_size=14, embed_dim=32, depth=1,
                           num_heads=2, dtype="float32"),
        pnp_iters=3,
    )
    model = BoxDreamer(cfg)
    B, NR, S = 2, 3, 28
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    ref_images = jax.random.uniform(ks[0], (B, NR, 3, S, S))
    ref_bf = jax.random.uniform(ks[1], (B, NR, 8, S, S)) * 2 - 1
    bbox_3d = jax.random.normal(ks[2], (B, 8, 3)) * 0.1
    K = jnp.broadcast_to(
        jnp.array([[100.0, 0, 14.0], [0, 100.0, 14.0], [0, 0, 1.0]]), (B, 3, 3)
    )
    mask = jnp.zeros((1, NR + 1), dtype=bool).at[:, -1].set(True)
    init_imgs = jnp.concatenate([ref_images[:1], ref_images[:1, :1]], 1)
    init_bf = jnp.concatenate([ref_bf[:1], ref_bf[:1, :1]], 1)
    params = model.init(ks[3], init_imgs, init_bf, mask)

    from boxdreamer_tpu.models.predictor import encoder_apply

    flat = ref_images.reshape((B * NR,) + ref_images.shape[2:])
    tokens = encoder_apply(model, params, flat).reshape(B, NR, -1, 32)
    q = jax.random.uniform(ks[4], (B, 3, S, S))

    out_plain = predict_query(model, params, q, tokens, ref_bf, bbox_3d, K)
    ref_fuse = decoder_embed(
        model, params, ref_bf, jnp.zeros((B, NR), bool), tokens
    )
    out_cached = predict_query(
        model, params, q, tokens, ref_bf, bbox_3d, K, ref_fuse=ref_fuse
    )
    for k in ("pred_bbox", "pred_kpts_2d", "pred_poses"):
        np.testing.assert_allclose(
            np.asarray(out_cached[k]), np.asarray(out_plain[k]),
            atol=1e-6, err_msg=k,
        )

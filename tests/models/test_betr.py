

def test_vector_representation_raises_like_reference():
    """Reference betr.py:96-99,421-424: pose_representation='vector' passes
    config validation but the decoder raises NotImplementedError."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from boxdreamer_tpu.models.betr import BETR, BETRConfig

    cfg = BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14,
        img_size=28, pose_representation="vector", dtype="float32",
    )
    rng = np.random.default_rng(0)
    pf = rng.uniform(-1, 1, (1, 2, 8, 28, 28)).astype(np.float32)
    tk = rng.normal(0, 1, (1, 2, 4, 32)).astype(np.float32)
    masks = np.zeros((1, 2), bool)
    masks[:, -1] = True
    with pytest.raises(NotImplementedError, match="vector"):
        BETR(cfg).init(jax.random.PRNGKey(0), pf, None, jnp.asarray(masks),
                       pretrain_rgb_feat=tk)

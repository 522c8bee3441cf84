import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.ops import decode, heatmap


def make_corners(key, batch=2, H=64, W=64, margin=12):
    return jax.random.uniform(
        key, (batch, 8, 2), minval=float(margin), maxval=float(W - margin)
    )


def reference_heatmap_numpy(bbox, H, W):
    """Direct numpy port of the reference formula
    (src/datasets/utils/base/bbox_utils.py:263-303) used as a golden spec.

    Note the normalization: ``bbox_map[..., i].max()`` in the reference is a
    GLOBAL max over the whole (T, H, W) slice — shared across frames, per
    corner (verified by tests/parity/test_preprocess_golden.py executing the
    real function)."""
    B = bbox.shape[0]
    out = np.zeros((B, 8, H, W), dtype=np.float32)
    xs = np.arange(W, dtype=np.float32)
    ys = np.arange(H, dtype=np.float32)
    center = bbox.mean(axis=1)
    for b in range(B):
        for i in range(8):
            dx = bbox[b, i, 0] - xs[None, :]
            dy = bbox[b, i, 1] - ys[:, None]
            dist = np.sqrt(dx**2 + dy**2)
            dis = np.sqrt(
                (center[b, 0] - bbox[b, i, 0]) ** 2
                + (center[b, 1] - bbox[b, i, 1]) ** 2
            )
            sf = (dis / 10.0) ** 2
            out[b, i] = np.exp(-dist / sf)
    peak = out.max(axis=(0, 2, 3), keepdims=True)  # per corner, joint frames
    return (out / peak) * 2 - 1


def test_heatmap_matches_reference_formula():
    key = jax.random.PRNGKey(0)
    corners = make_corners(key)
    ours = heatmap.make_heatmap_features(corners, 64, 64)
    golden = reference_heatmap_numpy(np.asarray(corners), 64, 64)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4)


def test_heatmap_range_and_peak():
    key = jax.random.PRNGKey(1)
    corners = make_corners(key)
    hm = np.asarray(heatmap.make_heatmap_features(corners, 64, 64))
    assert hm.min() >= -1.0 - 1e-6 and hm.max() <= 1.0 + 1e-6
    # The peak pixel should be the rounded corner location when in-bounds.
    b, i = 0, 3
    peak = np.unravel_index(hm[b, i].argmax(), hm[b, i].shape)
    cx, cy = np.asarray(corners)[b, i]
    assert abs(peak[1] - cx) <= 1.0 and abs(peak[0] - cy) <= 1.0


def test_voting_features_offsets():
    corners = jnp.array([[[10.0, 20.0]] * 8])
    vot = heatmap.make_voting_features(corners, 32, 32)
    assert vot.shape == (1, 16, 32, 32)
    # Channel 0 is c0 dx normalized by W: at pixel x=10 offset must be 0.
    np.testing.assert_allclose(vot[0, 0, :, 10], 0.0, atol=1e-6)
    np.testing.assert_allclose(vot[0, 1, 20, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(vot[0, 0, 0, 0], 10.0 / 32.0, atol=1e-6)


def test_decode_heatmap_topk_recovers_corners():
    key = jax.random.PRNGKey(2)
    corners = make_corners(key, batch=3, H=224, W=224, margin=30)
    hm = heatmap.make_heatmap_features(corners, 224, 224)
    norm_kpts, kpts = decode.decode_heatmap_topk(hm)
    # Top-20 average sits within ~2px of the true corner for a clean gaussian.
    err = np.abs(np.asarray(kpts) - np.asarray(corners)).max()
    assert err < 2.5, f"max decode error {err}"
    # Normalization formula parity: (k / [W,H]) * 2 - 1.
    expected = np.asarray(kpts) / np.array([224.0, 224.0]) * 2 - 1
    np.testing.assert_allclose(np.asarray(norm_kpts), expected, atol=1e-6)


def test_decode_topk_matches_bruteforce_topk():
    """The decode must equal the reference's literal top-20 index average."""
    key = jax.random.PRNGKey(3)
    hm = jax.random.uniform(key, (2, 8, 32, 32), minval=-1.0, maxval=1.0)
    _, kpts = decode.decode_heatmap_topk(hm, k=20)
    flat = np.asarray(hm).reshape(2, 8, -1)
    idx = np.argsort(-flat, axis=-1)[..., :20]
    xs = (idx % 32).mean(axis=-1)
    ys = (idx // 32).mean(axis=-1)
    np.testing.assert_allclose(np.asarray(kpts[..., 0]), xs, atol=1e-4)
    np.testing.assert_allclose(np.asarray(kpts[..., 1]), ys, atol=1e-4)


def test_decode_voting_roundtrip():
    key = jax.random.PRNGKey(4)
    corners = make_corners(key, batch=2, H=64, W=64)
    vot = heatmap.make_voting_features(corners, 64, 64)
    _, kpts = decode.decode_voting(vot)
    np.testing.assert_allclose(np.asarray(kpts), np.asarray(corners), atol=1e-2)


def test_decode_conf_voting_roundtrip():
    key = jax.random.PRNGKey(5)
    corners = make_corners(key, batch=2, H=64, W=64)
    feat = heatmap.make_conf_voting_features(corners, 64, 64)
    _, kpts = decode.decode_conf_voting(feat)
    np.testing.assert_allclose(np.asarray(kpts), np.asarray(corners), atol=1e-2)


def test_soft_argmax_close_to_topk():
    key = jax.random.PRNGKey(6)
    corners = make_corners(key, batch=2, H=112, W=112, margin=20)
    hm = heatmap.make_heatmap_features(corners, 112, 112)
    _, kpts = decode.decode_heatmap_soft_argmax(hm)
    err = np.abs(np.asarray(kpts) - np.asarray(corners)).max()
    assert err < 3.0


def test_cornernet_heatmap_peaks():
    corners = jnp.array([[[20.0, 30.0]] * 4 + [[40.0, 50.0]] * 4])
    hm = np.asarray(heatmap.make_cornernet_features(corners, 64, 64))
    assert hm.shape == (1, 8, 64, 64)
    assert hm.min() >= -1.0 and hm.max() <= 1.0
    peak = np.unravel_index(hm[0, 0].argmax(), (64, 64))
    assert peak == (30, 20)


def test_cornernet_out_of_bounds_corner_is_empty():
    corners = jnp.array([[[-50.0, -50.0]] + [[30.0, 30.0]] * 7])
    hm = np.asarray(heatmap.make_cornernet_features(corners, 64, 64))
    np.testing.assert_allclose(hm[0, 0], -1.0, atol=1e-6)


def test_feature_channels():
    assert heatmap.feature_channels("heatmap") == 8
    assert heatmap.feature_channels("voting") == 16
    assert heatmap.feature_channels("conf_voting") == 24

import jax
import jax.numpy as jnp
import numpy as np
import torch

from boxdreamer_tpu.training import loss as loss_lib


def test_smooth_l1_matches_torch():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(4, 8)).astype(np.float32) * 2
    gt = rng.normal(size=(4, 8)).astype(np.float32)
    ours = np.asarray(loss_lib.smooth_l1(jnp.asarray(pred), jnp.asarray(gt))).mean()
    ref = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(pred), torch.from_numpy(gt)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_huber_matches_torch():
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(4, 8)).astype(np.float32) * 2
    gt = rng.normal(size=(4, 8)).astype(np.float32)
    ours = np.asarray(loss_lib.huber(jnp.asarray(pred), jnp.asarray(gt))).mean()
    ref = torch.nn.functional.huber_loss(
        torch.from_numpy(pred), torch.from_numpy(gt)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_bce_matches_torch():
    rng = np.random.default_rng(2)
    pred = rng.normal(size=(4, 8)).astype(np.float32)
    gt = rng.uniform(size=(4, 8)).astype(np.float32)
    ours = np.asarray(
        loss_lib.bce_with_logits(jnp.asarray(pred), jnp.asarray(gt))
    ).mean()
    ref = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(pred), torch.from_numpy(gt)
    ).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_focal_matches_reference_formula():
    """CornerNet focal loss vs a direct torch port of the reference
    (focal_loss.py:18-59)."""
    rng = np.random.default_rng(3)
    pred = np.tanh(rng.normal(size=(2, 8, 16, 16))).astype(np.float32)
    gt = np.full((2, 8, 16, 16), -1.0, dtype=np.float32)
    gt[:, :, 5, 5] = 1.0  # one positive per channel

    ours = float(loss_lib.cornernet_focal(jnp.asarray(pred), jnp.asarray(gt)))

    p = (torch.from_numpy(pred) + 1) / 2
    g = (torch.from_numpy(gt) + 1) / 2
    p = torch.clamp(p, 1e-4, 1 - 1e-4)
    pos = g == 1.0
    pos_loss = ((1 - p) ** 2 * torch.log(p + 1e-9)) * pos
    neg = (~pos).float() * (1 - g) ** 4
    neg_loss = (p**2) * torch.log(1 - p + 1e-9) * neg
    ref = -(pos_loss.sum() + neg_loss.sum()) / pos.sum()
    np.testing.assert_allclose(ours, ref.item(), rtol=1e-4)


def test_masked_query_only_default_loss():
    """Default config: smooth_l1 on query frames only — identical preds on
    ref frames must not change the loss."""
    B, T = 2, 3
    rng = jax.random.PRNGKey(0)
    bbox_feat = jax.random.uniform(rng, (B, T, 8, 16, 16)) * 2 - 1
    pred1 = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 16, 16)) * 2 - 1
    mask = jnp.zeros((B, T), dtype=bool).at[:, 1].set(True)

    L = loss_lib.Loss()
    t1, _ = L({"pred_bbox": pred1, "bbox_feat": bbox_feat, "camera_mask": mask})
    # Corrupt non-query entries.
    pred2 = pred1.at[:, 0].set(0.0).at[:, 2].set(0.5)
    t2, _ = L({"pred_bbox": pred2, "bbox_feat": bbox_feat, "camera_mask": mask})
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)

    # And it equals the direct masked smooth_l1.
    direct = float(
        loss_lib.smooth_l1(pred1[:, 1].astype(jnp.float32), bbox_feat[:, 1]).mean()
    )
    np.testing.assert_allclose(float(t1), direct, rtol=1e-5)


def test_from_config():
    L = loss_lib.from_config(
        [
            {"type": "smooth_l1", "weight": [1.0, 0.0]},
            {"type": "mse", "weight": [0.5, 0.5], "pred_key": "pred_bbox"},
        ]
    )
    B, T = 1, 2
    data = {
        "pred_bbox": jnp.ones((B, T, 8, 4, 4)) * 0.5,
        "bbox_feat": jnp.zeros((B, T, 8, 4, 4)),
        "camera_mask": jnp.zeros((B, T), dtype=bool).at[:, 0].set(True),
    }
    total, details = L(data)
    assert np.isfinite(float(total))
    # smooth_l1(0.5) = 0.125 (query only); mse adds 0.5*0.25 + 0.5*0.25.
    np.testing.assert_allclose(float(total), 0.125 + 0.25, rtol=1e-6)


def test_perceptual_loss_term_from_config():
    """The 'PerceptualLoss' loss-term type (reference loss.py:29-30) builds
    from the YAML losses list and computes a scalar on image pairs."""
    import jax.numpy as jnp
    import numpy as np

    from boxdreamer_tpu.training import loss as L

    loss = L.from_config(
        [
            {"type": "smooth_l1", "weight": [1.0, 0.0]},
            {
                "type": "PerceptualLoss",
                "weight": [0.1, 0.0],
                "pred_key": "nvs_rgb",
                "gt_key": "nvs_rgb_gt",
                "mask_key": "",
            },
        ]
    )
    assert not loss.query_frame_only
    rng = np.random.default_rng(0)
    B, T = 2, 3
    data = {
        "pred_bbox": jnp.asarray(rng.uniform(-1, 1, (B, T, 8, 28, 28)), jnp.float32),
        "bbox_feat": jnp.asarray(rng.uniform(-1, 1, (B, T, 8, 28, 28)), jnp.float32),
        "camera_mask": jnp.zeros((B, T), bool).at[:, -1].set(True),
        "nvs_rgb": jnp.asarray(rng.uniform(0, 1, (B, 3, 28, 28)), jnp.float32),
        "nvs_rgb_gt": jnp.asarray(rng.uniform(0, 1, (B, 3, 28, 28)), jnp.float32),
    }
    total, details = loss(data)
    assert np.isfinite(float(total)) and float(total) > 0
    assert "nvs_rgb" in details and float(details["nvs_rgb"]) > 0
    # identical images -> zero perceptual term
    data["nvs_rgb_gt"] = data["nvs_rgb"]
    _, details2 = loss(data)
    assert float(details2["nvs_rgb"]) < 1e-10

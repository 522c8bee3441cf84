"""Golden: REAL reference DUSt3R regression losses (lossesV3.py Regr3D +
ConfLoss + L21) vs training/regression3d.

The reference vendored lossesV3.py WITHOUT its DUSt3R helper imports —
``inv``, ``geotrf``, ``get_pred_pts3d`` and ``normalize_pointcloud`` are
undefined symbols in the snapshot (lossesV3.py:166-189 would NameError), a
latent breakage like the plucker ones pinned in test_betr_heads_golden.
The golden injects faithful torch twins of those four standard DUSt3R
helpers (trivial, documented below) and then executes the reference's OWN
composition — anchor-frame transform, joint two-view normalization, masked
L21 criterion, confidence weighting, MultiLoss Sum — against
regr3d_two_view + conf_weighted on identical inputs.
"""

import numpy as np
import pytest
import torch

from parity import refshim

from boxdreamer_tpu.training import regression3d as R3D

B, H, W = 2, 6, 8


def _load_ref():
    mod = refshim.load("src.loss.lossesV3")
    # The four undefined helpers, with standard DUSt3R semantics:
    mod.inv = torch.linalg.inv

    def geotrf(T, pts):
        R = T[:, :3, :3]
        t = T[:, :3, 3]
        return torch.einsum("bij,bhwj->bhwi", R, pts) + t[:, None, None]

    mod.geotrf = geotrf
    # pred pointmaps are already expressed in view-1's frame (DUSt3R
    # convention); the snapshot gives no definition to be faithful to.
    mod.get_pred_pts3d = lambda gt, pred, use_pose=False: pred["pts3d"]

    def normalize_pointcloud(p1, p2, mode, v1, v2):
        assert mode == "avg_dis"
        if p2 is None:
            return p1 / p1.norm(dim=-1)[v1].mean()
        scale = torch.cat([p1.norm(dim=-1)[v1], p2.norm(dim=-1)[v2]]).mean()
        return p1 / scale, p2 / scale

    mod.normalize_pointcloud = normalize_pointcloud
    return mod


def _views(seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((B, 4, 4)))
    pose = np.broadcast_to(np.eye(4, dtype=np.float64), (B, 4, 4)).copy()
    # proper rotations + a translation
    for b in range(B):
        r = q[b, :3, :3]
        if np.linalg.det(r) < 0:
            r = -r
        pose[b, :3, :3] = r
        pose[b, :3, 3] = rng.standard_normal(3)

    def cloud():
        return rng.standard_normal((B, H, W, 3)).astype(np.float32) + 2.0

    v1 = rng.uniform(size=(B, H, W)) > 0.25
    v2 = rng.uniform(size=(B, H, W)) > 0.25
    conf1 = 1.0 + np.exp(rng.standard_normal((B, H, W))).astype(np.float32)
    conf2 = 1.0 + np.exp(rng.standard_normal((B, H, W))).astype(np.float32)
    return (cloud(), cloud(), cloud(), cloud(), pose.astype(np.float32),
            v1, v2, conf1, conf2)


@pytest.mark.parametrize("alpha", [1.0, 0.2])
def test_conf_regr3d_two_view_golden(alpha):
    mod = _load_ref()
    gt1p, gt2p, pr1p, pr2p, pose, v1, v2, c1, c2 = _views()

    loss_fn = mod.ConfLoss(mod.Regr3D(mod.L21), alpha=alpha)
    gt1 = {
        "pts3d": torch.from_numpy(gt1p),
        "valid_mask": torch.from_numpy(v1),
        "camera_pose": torch.from_numpy(pose),
    }
    gt2 = {
        "pts3d": torch.from_numpy(gt2p),
        "valid_mask": torch.from_numpy(v2),
        "camera_pose": torch.from_numpy(pose),
    }
    pred1 = {"pts3d": torch.from_numpy(pr1p), "conf": torch.from_numpy(c1)}
    pred2 = {"pts3d": torch.from_numpy(pr2p), "conf": torch.from_numpy(c2)}
    with torch.no_grad():
        total_ref, details = loss_fn(gt1, gt2, pred1, pred2)

    d1, d2 = R3D.regr3d_two_view(pr1p, pr2p, gt1p, gt2p, pose, v1, v2)
    ours = float(
        R3D.conf_weighted(d1, c1, v1, alpha)
        + R3D.conf_weighted(d2, c2, v2, alpha)
    )
    np.testing.assert_allclose(ours, float(total_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(R3D.conf_weighted(d1, c1, v1, alpha)),
        details["conf_loss_1"], rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(R3D.conf_weighted(d2, c2, v2, alpha)),
        details["conf_loss2"], rtol=2e-5, atol=1e-6,
    )


def test_regr3d_gt_scale_variant_golden():
    """gt_scale=True: only predictions normalize (lossesV3.py:186-189)."""
    mod = _load_ref()
    gt1p, gt2p, pr1p, pr2p, pose, v1, v2, c1, c2 = _views(seed=5)
    loss_fn = mod.ConfLoss(
        mod.Regr3D(mod.L21, gt_scale=True), alpha=1.0
    )
    gt1 = {
        "pts3d": torch.from_numpy(gt1p),
        "valid_mask": torch.from_numpy(v1),
        "camera_pose": torch.from_numpy(pose),
    }
    gt2 = {
        "pts3d": torch.from_numpy(gt2p),
        "valid_mask": torch.from_numpy(v2),
        "camera_pose": torch.from_numpy(pose),
    }
    pred1 = {"pts3d": torch.from_numpy(pr1p), "conf": torch.from_numpy(c1)}
    pred2 = {"pts3d": torch.from_numpy(pr2p), "conf": torch.from_numpy(c2)}
    with torch.no_grad():
        total_ref, _ = loss_fn(gt1, gt2, pred1, pred2)
    d1, d2 = R3D.regr3d_two_view(
        pr1p, pr2p, gt1p, gt2p, pose, v1, v2, gt_scale=True
    )
    ours = float(
        R3D.conf_weighted(d1, c1, v1, 1.0) + R3D.conf_weighted(d2, c2, v2, 1.0)
    )
    np.testing.assert_allclose(ours, float(total_ref), rtol=2e-5, atol=1e-6)

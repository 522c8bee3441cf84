"""Golden parity: REAL reference metric suite (metric_utils.py, executing
scipy cKDTree / sklearn AUC) vs training/metrics.py.

Instantiates the actual reference ``Metrics`` class (torchmetrics shimmed)
and compares pose errors, ADD/ADD-S with the real cKDTree, AUC helpers, and
the denormalization order (scale then coordinate_transform) on random data.
"""

import numpy as np
import pytest

from parity import refshim

from boxdreamer_tpu.training import metrics as mym


@pytest.fixture(scope="module")
def ref_metrics():
    mod = refshim.load("src.lightning.utils.metrics.metric_utils")

    class Cfg:
        t_scale = "m"
        pose_thresholds = [1, 3, 5, 10, 15, 20, 30]
        metrics_list = ["pose_error", "ADD_metric", "proj2d_metric"]

    return mod, mod.Metrics(Cfg())


def _rot(rng, max_angle=2.5):
    a = rng.normal(size=3)
    a /= np.linalg.norm(a)
    th = rng.uniform(0, max_angle)
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _pose(rng):
    p = np.eye(4)
    p[:3, :3] = _rot(rng)
    p[:3, 3] = rng.uniform(-0.3, 0.3, 3) + [0, 0, 0.8]
    return p


def test_query_pose_error_golden(ref_metrics):
    mod, ref = ref_metrics
    rng = np.random.default_rng(0)
    for _ in range(15):
        gt, pred = _pose(rng), _pose(rng)
        R_ref, t_ref, ip_ref = ref.query_pose_error(pred.copy(), gt.copy())
        R_my, t_my, ip_my = mym.query_pose_error(pred, gt, t_scale="m")
        np.testing.assert_allclose(R_my, R_ref, rtol=1e-9)
        np.testing.assert_allclose(t_my, t_ref, rtol=1e-9)
        np.testing.assert_allclose(ip_my, ip_ref, rtol=1e-9)


def test_add_metrics_golden_with_real_ckdtree(ref_metrics):
    """ADD/ADD-S against the reference's scipy cKDTree computation
    (metric_utils.py:365-447) — my chunked brute-force must agree."""
    mod, ref = ref_metrics
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.05, 0.05, (800, 3))
    for _ in range(5):
        gt, pred = _pose(rng), _pose(rng)
        model_pred = pts @ pred[:3, :3].T + pred[:3, 3]
        model_gt = pts @ gt[:3, :3].T + gt[:3, 3]
        from scipy import spatial

        kd = spatial.cKDTree(model_pred)
        adds_ref, _ = kd.query(model_gt, k=1)
        adds_ref = float(np.mean(adds_ref))
        add_ref = float(np.mean(np.linalg.norm(model_pred - model_gt, axis=-1)))

        out = mym.add_metrics(pts, pred, gt)
        np.testing.assert_allclose(out["add"], add_ref, rtol=1e-9)
        np.testing.assert_allclose(out["adds"], adds_ref, rtol=1e-9)
        diameter = np.linalg.norm(pts.max(0) - pts.min(0))
        assert out["add_score"] == (1.0 if add_ref < 0.1 * diameter else 0.0)


def test_proj2d_golden(ref_metrics):
    mod, ref = ref_metrics
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.05, 0.05, (300, 3))
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    for _ in range(5):
        gt, pred = _pose(rng), _pose(rng)
        p2d_ref = ref.project(pts, K, pred[:3])
        g2d_ref = ref.project(pts, K, gt[:3])
        err_ref = float(np.mean(np.linalg.norm(p2d_ref - g2d_ref, axis=1)))
        err_my = mym.proj2d_mean_error(pts, K, pred, gt)
        np.testing.assert_allclose(err_my, err_ref, rtol=1e-9)


def test_auc_golden(ref_metrics):
    """AUC vs the reference's sklearn-based helpers (metric_utils.py:770-786).
    My trapezoid implementation uses the same 1000-step threshold grids."""
    mod, _ = ref_metrics
    rng = np.random.default_rng(3)
    add_errs = np.abs(rng.normal(0.03, 0.03, 200))
    proj_errs = np.abs(rng.normal(8.0, 10.0, 200))
    np.testing.assert_allclose(
        mym.auc(add_errs, 0.10), mod.auc_add(add_errs), atol=1.5e-3
    )
    np.testing.assert_allclose(
        mym.auc(proj_errs, 40.0), mod.auc_proj2d(proj_errs), atol=1.5e-3
    )


def test_denormalization_order_golden(ref_metrics):
    """Un-normalization at metric time: scale multiplies the translation
    BEFORE the coordinate_transform right-multiplication (metric_utils.py:
    281-283,365-367) — order matters; verify the composed result."""
    mod, ref = ref_metrics
    rng = np.random.default_rng(4)
    pose = _pose(rng)
    ct = _pose(rng)
    scale = np.array([1.7, 1.7, 1.7])
    ref_pose = pose.copy()
    ref_pose[:3, 3] *= scale
    ref_pose = ref_pose @ ct
    my_pose = mym.denormalize_pred_pose(pose, scale, ct)
    np.testing.assert_allclose(my_pose, ref_pose, rtol=1e-12)

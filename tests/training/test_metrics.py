import numpy as np
import pytest

from boxdreamer_tpu.training import metrics as M


def rot_z(deg):
    r = np.deg2rad(deg)
    return np.array(
        [[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1.0]]
    )


def make_pose(R=np.eye(3), t=(0, 0, 1.0)):
    p = np.eye(4)
    p[:3, :3] = R
    p[:3, 3] = t
    return p


def test_query_pose_error_exact():
    gt = make_pose()
    pred = make_pose(rot_z(10), (0.05, 0, 1.0))
    r, t, ip = M.query_pose_error(pred, gt, t_scale="m")
    np.testing.assert_allclose(r, 10.0, atol=1e-5)
    np.testing.assert_allclose(t, 5.0, atol=1e-5)  # 5 cm
    np.testing.assert_allclose(ip, 10.0, atol=1e-5)


def test_query_pose_error_t_scale():
    gt = make_pose()
    pred = make_pose(t=(0.0, 0.0, 1.1))
    _, t_m, _ = M.query_pose_error(pred, gt, t_scale="m")
    _, t_mm, _ = M.query_pose_error(pred, gt, t_scale="mm")
    np.testing.assert_allclose(t_m, 10.0, atol=1e-4)
    np.testing.assert_allclose(t_mm, 0.01, atol=1e-5)


def test_add_identity_is_zero():
    pts = np.random.default_rng(0).uniform(-0.05, 0.05, (500, 3))
    pose = make_pose(rot_z(30), (0.1, 0.2, 0.9))
    m = M.add_metrics(pts, pose[:3], pose[:3])
    assert m["add"] == 0.0 and m["add_score"] == 1.0
    assert m["adds"] < 1e-7 and m["adds_score"] == 1.0


def test_adds_symmetric_object():
    """ADD-S must be ~0 for a rotation that maps a symmetric point set onto
    itself, while ADD is large."""
    ang = np.linspace(0, 2 * np.pi, 36, endpoint=False)
    ring = np.stack([np.cos(ang) * 0.05, np.sin(ang) * 0.05, np.zeros(36)], axis=1)
    gt = make_pose(t=(0, 0, 1.0))
    pred = make_pose(rot_z(40), (0, 0, 1.0))
    m = M.add_metrics(ring, pred[:3], gt[:3])
    assert m["add"] > 0.01
    assert m["adds"] < 1e-3


def test_proj2d_error_zero_same_pose():
    pts = np.random.default_rng(1).uniform(-0.05, 0.05, (200, 3))
    K = np.array([[500.0, 0, 112], [0, 500.0, 112], [0, 0, 1]])
    pose = make_pose(rot_z(15), (0, 0, 0.8))
    assert M.proj2d_mean_error(pts, K, pose, pose) == 0.0


def test_auc_formula():
    errs = np.array([0.0, 0.05, 0.2])  # 2/3 below 0.1
    a = M.auc(errs, 0.10)
    # Accuracy is 1/3 at t<0.05, 2/3 above: integral ~ (1/3*0.05 + 2/3*0.05)/0.1.
    np.testing.assert_allclose(a, (0.05 / 3 + 0.1 / 3) / 0.1, atol=0.01)


def test_denormalize_pose():
    pose = make_pose(rot_z(20), (0.1, 0.2, 0.3))
    transform = make_pose(rot_z(-45), (0.3, 0.0, 0.1))
    normalized = pose @ np.linalg.inv(transform)
    normalized[:3, 3] /= 2.0
    restored = M.denormalize_pred_pose(normalized, 2.0, transform)
    np.testing.assert_allclose(restored, pose, atol=1e-10)


def test_metrics_accumulate_and_aggregate():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-0.05, 0.05, (300, 3))
    K = np.array([[500.0, 0, 112], [0, 500.0, 112], [0, 0, 1]])
    m = M.Metrics()
    gt = make_pose(t=(0, 0, 1.0))
    # Two good predictions, one bad.
    m.update(make_pose(rot_z(0.5), (0, 0, 1.003)), gt, K, pts, cat="cat_a")
    m.update(make_pose(rot_z(1.0), (0.004, 0, 1.0)), gt, K, pts, cat="cat_a")
    m.update(make_pose(rot_z(90), (0.5, 0, 1.5)), gt, K, pts, cat="cat_b")
    agg = m.aggregate()
    assert agg["5cm@5degree_0"]["cat_a"] == 1.0
    assert agg["5cm@5degree_0"]["cat_b"] == 0.0
    np.testing.assert_allclose(agg["5cm@5degree_0"]["all"], 2 / 3, atol=1e-6)
    assert agg["ADD-0.1d 0"]["cat_a"] == 1.0
    assert agg["proj2D@5px 0"]["cat_a"] == 1.0
    assert agg["eval size_0"]["all"] == 3


def test_metrics_merge():
    a, b = M.Metrics(), M.Metrics()
    gt = make_pose()
    a.update(make_pose(rot_z(1)), gt, np.eye(3))
    b.update(make_pose(rot_z(50)), gt, np.eye(3))
    a.merge(b)
    assert a.aggregate()["eval size_0"]["all"] == 2


def test_save_json(tmp_path):
    m = M.Metrics()
    m.update(make_pose(), make_pose(), np.eye(3))
    p = tmp_path / "test_metrics.json"
    m.save_json(str(p))
    import json

    data = json.loads(p.read_text())
    assert "5cm@5degree_0" in data


def test_image_psnr_branch_matches_torchmetrics_semantics():
    """'image' metrics branch (reference rgb_metrics, metric_utils.py:
    131-160): PSNR with torchmetrics' default inferred data_range,
    aggregated as psnr_{dataloader_id} per category."""
    import numpy as np

    from boxdreamer_tpu.training.metrics import Metrics, MetricsConfig

    m = Metrics(MetricsConfig(metrics_list=("pose_error", "image")),
                dataloader_id=1)
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (3, 16, 16))
    pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1)
    val = m.update_image(pred, gt, cat="cam")
    # torchmetrics PeakSignalNoiseRatio default: data_range inferred from
    # the TARGET (target.max() - target.min()); psnr = 10 log10(r^2 / mse)
    want = 10 * np.log10((gt.max() - gt.min()) ** 2 /
                         np.mean((pred - gt) ** 2))
    assert val == pytest.approx(want, rel=1e-12)

    m.update_image(gt, gt, cat="cam")  # identical -> inf
    agg = m.aggregate()
    assert "psnr_1" in agg and set(agg["psnr_1"]) == {"cam", "all"}
    assert np.isinf(agg["psnr_1"]["cam"])

    # disabled unless 'image' is listed
    m2 = Metrics(MetricsConfig())
    assert m2.update_image(pred, gt) is None
    assert "psnr_0" not in m2.aggregate()

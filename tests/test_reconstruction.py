"""Reconstruction subsystem tests: geometry core + visual-hull end-to-end."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from fixture import CUBE_HALF, make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.reconstruction import geometry
from boxdreamer_tpu.reconstruction.carve import VisualHullReconstructor


def rot_z(deg):
    r = np.deg2rad(deg)
    return np.array(
        [[np.cos(r), -np.sin(r), 0], [np.sin(r), np.cos(r), 0], [0, 0, 1.0]]
    )


def test_umeyama_exact():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(50, 3))
    R_true = rot_z(35)
    s_true, t_true = 1.7, np.array([0.3, -0.1, 0.5])
    dst = s_true * src @ R_true.T + t_true
    s, R, t = geometry.umeyama_alignment(src, dst)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)


def test_align_camera_extrinsics():
    rng = np.random.default_rng(1)
    est = np.tile(np.eye(4), (6, 1, 1))
    for i in range(6):
        est[i, :3, :3] = rot_z(rng.uniform(0, 360))
        est[i, :3, 3] = rng.normal(size=3)
    # GT = similarity-transformed version of est world.
    s_true, R_true, t_true = 0.5, rot_z(-20), np.array([1.0, 0, 0])
    gt = est.copy()
    for i in range(6):
        c_est = -est[i, :3, :3].T @ est[i, :3, 3]
        c_gt = s_true * R_true @ c_est + t_true
        gt[i, :3, 3] = -gt[i, :3, :3] @ c_gt  # keep R, move center
    s, T = geometry.align_camera_extrinsics(est, gt)
    np.testing.assert_allclose(s, s_true, rtol=1e-5)
    np.testing.assert_allclose(T[:3, :3], R_true, atol=1e-6)


def test_self_prune_removes_outliers():
    rng = np.random.default_rng(2)
    cloud = rng.normal(scale=0.02, size=(500, 3))
    outliers = rng.normal(scale=0.02, size=(5, 3)) + 10.0
    pts = np.concatenate([cloud, outliers])
    kept, _ = geometry.self_prune(pts, std_ratio=2.0)
    assert len(kept) >= 490
    assert np.abs(kept).max() < 1.0


def test_visual_hull_recovers_cube(tmp_path):
    """End-to-end: fixture crops (black background, cube object) -> visual
    hull -> point cloud whose 3D box matches the true 10cm cube."""
    from boxdreamer_tpu.data import DatasetConfig, build_dataset

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=8, n_test=2)
    cfg = DatasetConfig(image_size=128, length=7)
    ds = build_dataset("LINEMOD", cfg, "test", root=root)
    batch = ds[0]

    recon = VisualHullReconstructor(resolution=48)
    recon.set_processed_data(
        {
            "images": batch["images"][:6],
            "non_ndc_intrinsics": batch["non_ndc_intrinsics"][:6],
            "poses": batch["poses"][:6],
        }
    )
    out_ply = str(tmp_path / "out" / "cube.ply")
    result = recon.run(output_ply=out_ply)
    assert os.path.exists(out_ply)
    assert os.path.exists(str(tmp_path / "out" / "box3d_corners.txt"))
    extent = np.ptp(result["bbox_3d"], axis=0)
    # The fixture object is a 2*CUBE_HALF cube; silhouette carving from a
    # ring of views recovers x/y extents well (z less constrained).
    assert extent.max() < 6 * CUBE_HALF
    assert extent.min() > 0.5 * CUBE_HALF
    # Points centered near the origin (object frame).
    center = result["points"].mean(axis=0)
    assert np.linalg.norm(center) < 4 * CUBE_HALF


def test_reconstruction_driver(tmp_path):
    from boxdreamer_tpu.reconstruction.main import reconstruct_dataset

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=6, n_test=2)
    out_root = reconstruct_dataset("LINEMOD", root, backend="carve", num_views=5,
                                   image_size=96)
    assert os.path.isdir(out_root)
    assert os.path.exists(os.path.join(out_root, "cat", "cat.ply"))

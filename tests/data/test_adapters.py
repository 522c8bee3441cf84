"""Adapter tests over synthetic fixtures for each dataset's layout contract."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from fixture import K_DEFAULT, cube_vertices, look_at_pose, project, write_cube_ply  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset

CFG = DatasetConfig(image_size=64, length=3)


def save_img(path, box=None, size=(640, 480)):
    img = Image.new("RGB", size, (15, 15, 20))
    if box is not None:
        from PIL import ImageDraw

        ImageDraw.Draw(img).rectangle([int(v) for v in box], fill=(200, 130, 70))
    img.save(path)


def frame_box(pose):
    pts = project(K_DEFAULT, pose, cube_vertices())
    return np.array([pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()])


# ---------------------------------------------------------------- YCBV


def make_ycbv(root, n=5):
    for split in ("train", "test"):
        d = os.path.join(root, split, "obj01")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            pose = look_at_pose(2 * np.pi * i / n)
            box = frame_box(pose)
            base = os.path.join(d, f"{i:06d}")
            save_img(base + "-color.png", box)
            np.savetxt(base + "-pose.txt", pose)
            np.savetxt(base + "-intrinsics.txt", K_DEFAULT)
            np.savetxt(base + "-box.txt", box)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    write_cube_ply(os.path.join(root, "models", "obj01.ply"))
    return root


def test_ycbv_adapter(tmp_path):
    root = make_ycbv(str(tmp_path))
    ds = build_dataset("YCBV", CFG, "test", root=root)
    assert len(ds) == 5
    assert ds.cat_len["ref"]["obj01"] == 5
    batch = ds[0]
    assert batch["images"].shape == (3, 3, 64, 64)
    assert batch["bbox_feat"].shape == (3, 8, 64, 64)
    assert ds.get_model_path("obj01").endswith("obj01.ply")


def test_ycbv_same_seq_mode(tmp_path):
    root = make_ycbv(str(tmp_path))
    ds = build_dataset("YCBV", CFG, "test", root=root, ref_mode="same_seq")
    assert ds.images["ref"]["obj01"] == ds.images["test"]["obj01"]


# ---------------------------------------------------------------- OnePose


def make_onepose(root, n=4):
    box3d = (np.array(
        [
            [0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0],
            [0, 0, 1], [0, 1, 1], [1, 1, 1], [1, 0, 1],
        ], dtype=np.float64,
    ) - 0.5) * 0.1
    for seq in ("1", "2"):
        seq_dir = os.path.join(root, "test_data", "0408-box", f"box-{seq}")
        for sub in ("color", "poses_ba", "intrin_ba"):
            os.makedirs(os.path.join(seq_dir, sub), exist_ok=True)
        for i in range(n):
            pose = look_at_pose(2 * np.pi * (i + (0.3 if seq == "2" else 0)) / n)
            save_img(os.path.join(seq_dir, "color", f"{i}.png"), frame_box(pose))
            np.savetxt(os.path.join(seq_dir, "poses_ba", f"{i}.txt"), pose)
            np.savetxt(os.path.join(seq_dir, "intrin_ba", f"{i}.txt"), K_DEFAULT)
    np.savetxt(os.path.join(root, "test_data", "0408-box", "box3d_corners.txt"), box3d)
    return root


def test_onepose_first_seq_mode(tmp_path):
    root = make_onepose(str(tmp_path))
    ds = build_dataset("OnePose", CFG, "test", root=root)
    # seq 1 -> ref DB; seq 2 -> eval split, merged per object.
    # Reference cat keys drop everything after the first dash in the
    # object dirname (onepose.py:294): "0408-box" -> "0408".
    assert ds.cat_len["ref"]["0408"] == 4
    assert ds.cat_len["test"]["0408"] == 4
    batch = ds[0]
    assert batch["bbox_3d"].shape == (3, 8, 3)
    assert batch["bbox_feat"].shape == (3, 8, 64, 64)


def test_onepose_same_seq_mode(tmp_path):
    root = make_onepose(str(tmp_path))
    ds = build_dataset("OnePose", CFG, "test", root=root, ref_mode="same_seq")
    assert "0408_1" in ds.cat_len["test"]
    assert "0408_2" in ds.cat_len["test"]


# ---------------------------------------------------------------- MOPED


def make_moped(root, n=4):
    for split_dir, seq in (("reference", "s0"), ("test", "s1")):
        d = os.path.join(root, split_dir, "toy", seq)
        for sub in ("color", "mask", "pose", "intrinsics"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        for i in range(n):
            pose = look_at_pose(2 * np.pi * i / n)
            box = frame_box(pose)
            save_img(os.path.join(d, "color", f"{i}.jpg"), box)
            mask = np.zeros((480, 640), np.uint8)
            x0, y0, x1, y1 = [int(v) for v in box]
            mask[y0:y1, x0:x1] = 255
            Image.fromarray(mask).save(os.path.join(d, "mask", f"{i}.png"))
            np.savetxt(os.path.join(d, "pose", f"{i}.txt"), pose)
            np.savetxt(os.path.join(d, "intrinsics", f"{i}.txt"), K_DEFAULT)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    write_cube_ply(os.path.join(root, "models", "toy.ply"))
    return root


def test_moped_adapter(tmp_path):
    root = make_moped(str(tmp_path))
    ds = build_dataset("MOPED", CFG, "test", root=root)
    assert len(ds) == 4
    # Per-sequence categories with the reference's prefix naming
    # (moped.py:160-164); same_seq default -> ref == the test sequence.
    assert ds.cat_len["ref"]["test-toy-s1"] == 4
    # Mask-derived box (inclusive max, reference moped.py:264-274).
    box = ds.read_box(ds.boxes["test"]["test-toy-s1"][0])
    assert box is not None and box[2] > box[0]
    batch = ds[0]
    assert batch["images"].shape == (3, 3, 64, 64)


# ---------------------------------------------------------------- CO3D


def make_co3d(root, n=4):
    seq_dir = os.path.join(root, "co3d_test", "mug", "seq0", "images")
    os.makedirs(seq_dir, exist_ok=True)
    sel = {"mug": ["seq0"]}
    import json

    with open(os.path.join(root, "co3d_test", "selected_seqs_test.json"), "w") as f:
        json.dump(sel, f)
    for i in range(n):
        pose = look_at_pose(2 * np.pi * i / n)
        save_img(os.path.join(seq_dir, f"frame{i:06d}.jpg"), frame_box(pose))
        # CO3D stores cam2world npz with the reference's key names
        # (co3d.py:131-146).
        np.savez(
            os.path.join(seq_dir, f"frame{i:06d}.npz"),
            camera_pose=np.linalg.inv(pose), camera_intrinsics=K_DEFAULT,
        )
    raw_dir = os.path.join(root, "co3d_test_raw", "mug", "seq0")
    os.makedirs(raw_dir, exist_ok=True)
    write_cube_ply(os.path.join(raw_dir, "pointcloud.ply"))
    return root


def test_co3d_adapter_npz_conversion(tmp_path):
    root = make_co3d(str(tmp_path))
    ds = build_dataset("CO3D", CFG, "test", root=root)
    assert len(ds) == 4
    # npz files converted to txt on load.
    assert ds.poses["test"]["mug_seq0"][0].endswith("_pose.txt")
    # read_pose inverts cam2world back to world2cam.
    pose = ds.read_pose(ds.poses["test"]["mug_seq0"][0])
    np.testing.assert_allclose(pose, look_at_pose(0.0), atol=1e-6)
    batch = ds[0]
    assert batch["images"].shape == (3, 3, 64, 64)


# ---------------------------------------------------------------- Objaverse


def make_objaverse(root, n=4):
    obj_dir = os.path.join(root, "objaverse_render/_v0", "000", "objA", "random")
    for sub in ("color", "pose", "intrinsics"):
        os.makedirs(os.path.join(obj_dir, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "bbox_3d"), exist_ok=True)
    box3d = (np.random.default_rng(0).uniform(0, 1, (8, 3)) - 0.5) * 0.1
    np.savetxt(os.path.join(root, "bbox_3d", "objA.txt"), box3d)
    for i in range(n):
        pose = look_at_pose(2 * np.pi * i / n)
        save_img(os.path.join(obj_dir, "color", f"{i}.png"), frame_box(pose))
        np.savetxt(os.path.join(obj_dir, "pose", f"{i}.txt"), pose)
        np.savetxt(os.path.join(obj_dir, "intrinsics", f"{i}.txt"), K_DEFAULT)
    return root


def test_objaverse_adapter(tmp_path):
    root = make_objaverse(str(tmp_path))
    ds = build_dataset("Objaverse", CFG, "test", root=root)
    assert len(ds) == 4
    batch = ds[0]
    assert batch["bbox_3d"].shape == (3, 8, 3)
    assert batch["images"].shape == (3, 3, 64, 64)

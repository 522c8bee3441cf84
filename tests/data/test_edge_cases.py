"""Edge-case coverage: out-of-frame objects (padding + intrinsics adjust),
non-square images, degenerate boxes."""

import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from fixture import (  # noqa: E402
    K_DEFAULT,
    cube_vertices,
    look_at_pose,
    project,
    write_cube_ply,
)

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.data import preprocess as pp


def make_edge_fixture(root, n=4):
    """Object near the image border so its projected 3D box exceeds the
    frame — exercising pad_image_for_bbox + adjust_intrinsics_for_padding
    (reference base.py:479-501)."""
    K_off = K_DEFAULT.copy()
    K_off[0, 2] = 40.0  # principal point near the left edge
    for split, ns in (("real_train", n), ("real_test", 2)):
        d = os.path.join(root, split, "cat")
        os.makedirs(d, exist_ok=True)
        for i in range(ns):
            pose = look_at_pose(2 * np.pi * i / max(ns, 1), radius=0.35)
            pts = project(K_off, pose, cube_vertices())
            box = np.array(
                [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
            )
            img = Image.new("RGB", (640, 480), (18, 18, 24))
            from PIL import ImageDraw

            clipped = [
                max(int(box[0]), 0), max(int(box[1]), 0),
                min(int(box[2]), 639), min(int(box[3]), 479),
            ]
            if clipped[2] > clipped[0] and clipped[3] > clipped[1]:
                ImageDraw.Draw(img).rectangle(clipped, fill=(180, 120, 60))
            base = os.path.join(d, f"{i:04d}")
            img.save(base + "-color.png")
            np.savetxt(base + "-pose.txt", pose)
            np.savetxt(base + "-intrisic.txt", K_off)
            suffix = "-box.txt" if split == "real_train" else "-box_fasterrcnn.txt"
            np.savetxt(base + suffix, box)
    model_dir = os.path.join(root, "models", "cat")
    os.makedirs(model_dir, exist_ok=True)
    write_cube_ply(os.path.join(model_dir, "cat.ply"))
    return root


def test_out_of_frame_object_stays_consistent(tmp_path):
    """Even with the projected box partially outside the image, the stored
    intrinsics/poses must reproject the 3D box onto the stored projection."""
    root = make_edge_fixture(str(tmp_path / "lm"))
    ds = build_dataset(
        "LINEMOD", DatasetConfig(image_size=128, length=3), "test", root=root
    )
    batch = ds[0]
    S = 128
    for t in range(3):
        proj = pp.project_points(
            batch["non_ndc_intrinsics"][t].astype(np.float64),
            batch["poses"][t].astype(np.float64),
            batch["bbox_3d"][t].astype(np.float64),
        )
        stored = (batch["bbox_proj_crop"][t] + 1.0) / 2.0 * S
        clamp_mask = (np.abs(batch["bbox_proj_crop"][t]) < 4.99).all(axis=-1)
        np.testing.assert_allclose(proj[clamp_mask], stored[clamp_mask], atol=1.0)
    assert np.isfinite(batch["bbox_feat"]).all()


def test_pad_image_for_bbox_adjusts_intrinsics():
    img = Image.new("RGB", (100, 80), (10, 10, 10))
    box = np.array([-20.0, -10.0, 60.0, 70.0])
    padded, info = pp.pad_image_for_bbox(img, box)
    assert info == {"left": 20.0, "top": 10.0, "right": 0, "bottom": 0}
    assert padded.size == (120, 90)
    K = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    K2 = pp.adjust_intrinsics_for_padding(K, info)
    assert K2[0, 2] == 70 and K2[1, 2] == 50


def test_nonsquare_image_center_crop():
    img = Image.new("RGB", (320, 240), (50, 60, 70))
    arr, _, crop_params, bbox = pp.pad_and_resize_image(img, 64, bbox_anno=None)
    assert arr.shape == (3, 64, 64)
    # Center-crop of the longest side: square of 320 centered vertically.
    np.testing.assert_allclose(bbox, [0, -40, 320, 280])
    # Full-frame crop params: scale = 320/240.
    np.testing.assert_allclose(float(crop_params[3]), 320 / 240, rtol=1e-6)


def test_degenerate_zero_box():
    img = Image.new("RGB", (64, 64))
    arr, _, _, bbox = pp.pad_and_resize_image(
        img, 32, bbox_anno=np.zeros(4)
    )
    # All-zero box treated as "no box" (reference `not bbox_anno.any()`).
    assert arr.shape == (3, 32, 32)
    np.testing.assert_allclose(bbox, [0, 0, 64, 64])

"""Golden parity: REAL reference preprocessing (preprocess.py, bbox_utils.py,
camera_utils.py, camera_transform.py NDC chain) vs boxdreamer_tpu.data.

Executes the actual /root/reference functions (torchvision shimmed with the
same antialiased triangle filter it uses; see refshim.py) on random inputs.
"""

import numpy as np
import pytest
import torch
from PIL import Image

from parity import refshim

from boxdreamer_tpu.data import preprocess as myp


@pytest.fixture(scope="module")
def ref_pre():
    return refshim.load("src.datasets.utils.preprocess")


@pytest.fixture(scope="module")
def ref_bbox_utils():
    return refshim.load("src.datasets.utils.base.bbox_utils")


@pytest.fixture(scope="module")
def ref_cam_utils():
    return refshim.load("src.datasets.utils.base.camera_utils")


@pytest.fixture(scope="module")
def ref_ct():
    return refshim.load("src.utils.camera_transform")


def _rand_img(rng, w, h):
    return Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8), mode="RGB"
    )


def test_square_bbox_golden(ref_pre):
    rng = np.random.default_rng(0)
    for _ in range(20):
        x0, y0 = rng.uniform(-50, 400, 2)
        w, h = rng.uniform(1, 300, 2)
        bbox = np.array([x0, y0, x0 + w, y0 + h])
        for padding in (0.0, 0.1, 0.25):
            ref = ref_pre.square_bbox(bbox.copy(), padding=padding)
            mine = myp.square_bbox(bbox, padding=padding)
            np.testing.assert_allclose(mine, ref, rtol=1e-12)


def test_crop_parameters_golden(ref_pre):
    rng = np.random.default_rng(1)
    for _ in range(15):
        w, h = int(rng.integers(100, 800)), int(rng.integers(100, 800))
        img = Image.new("RGB", (w, h))
        x0, y0 = rng.uniform(-30, w), rng.uniform(-30, h)
        s = rng.uniform(10, 200)
        bbox = np.array([x0, y0, x0 + s, y0 + s])
        ref = ref_pre.calculate_crop_parameters(img, bbox, int(s), 224).numpy()
        mine = myp.calculate_crop_parameters((w, h), bbox)
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def test_pad_image_and_intrinsics_golden(ref_pre):
    rng = np.random.default_rng(2)
    for _ in range(10):
        w, h = int(rng.integers(60, 200)), int(rng.integers(60, 200))
        img = _rand_img(rng, w, h)
        bbox = np.array(
            [
                rng.uniform(-40, 10),
                rng.uniform(-40, 10),
                w + rng.uniform(-10, 40),
                h + rng.uniform(-10, 40),
            ]
        )
        K = np.array(
            [[500.0, 0, w / 2 + rng.uniform(-5, 5)], [0, 510.0, h / 2], [0, 0, 1]]
        )
        ref_img, ref_pad = ref_pre.pad_image_based_on_bbox(img.copy(), bbox)
        my_img, my_pad = myp.pad_image_for_bbox(img.copy(), bbox)
        assert (ref_pad is None) == (my_pad is None)
        np.testing.assert_array_equal(np.asarray(my_img), np.asarray(ref_img))
        if ref_pad is not None:
            ref_K = ref_pre.adjust_camera_intrinsics(K, ref_pad)
            my_K = myp.adjust_intrinsics_for_padding(K, my_pad)
            np.testing.assert_allclose(my_K, ref_K, rtol=1e-12)


@pytest.mark.parametrize("out_size", [112, 224])
def test_pad_and_resize_golden(ref_pre, out_size):
    rng = np.random.default_rng(3)
    for case in range(6):
        w, h = int(rng.integers(150, 500)), int(rng.integers(150, 500))
        img = _rand_img(rng, w, h)
        if case == 0:
            bbox_anno = None  # center-crop-longest path
        else:
            x0, y0 = rng.uniform(-20, w - 60, 2)
            bw, bh = rng.uniform(40, 250, 2)
            bbox_anno = np.asarray(
                ref_pre.square_bbox(np.array([x0, y0, x0 + bw, y0 + bh]))
            )
        ref_img, _, ref_cp, ref_bbox = ref_pre.pad_and_resize_image(
            img.copy(),
            crop_longest=True,
            img_size=out_size,
            bbox_anno=bbox_anno if bbox_anno is not None else np.zeros(4),
        )
        my_img, _, my_cp, my_bbox = myp.pad_and_resize_image(
            img.copy(), out_size, bbox_anno=bbox_anno
        )
        np.testing.assert_allclose(my_bbox, np.asarray(ref_bbox, dtype=np.float64))
        np.testing.assert_allclose(my_cp, ref_cp.numpy(), rtol=1e-5, atol=1e-6)
        ref_arr = ref_img.numpy()
        if ref_arr.shape != my_img.shape:
            # Latent reference bug: square_bbox(..., astype=int) can produce a
            # w/h off-by-one box (e.g. 249x250); torchvision Resize(int) then
            # emits a NON-square image (225x224) that would crash the
            # reference's own torch.stack. My pipeline always yields square
            # (S, S) crops. Verify this is exactly that case and move on.
            bw, bh = ref_bbox[2] - ref_bbox[0], ref_bbox[3] - ref_bbox[1]
            assert int(bw) != int(bh) and abs(int(bw) - int(bh)) <= 1
            assert my_img.shape == (3, out_size, out_size)
            continue
        # PIL resizes via the same triangle filter but quantizes to uint8;
        # allow ~1.5 LSB.
        np.testing.assert_allclose(my_img, ref_arr, atol=1.6 / 255.0, rtol=0)


def test_intrinsics_crop_resize_chain_golden(ref_ct):
    """My single pixel-space K adjustment vs the reference's four-step NDC
    round trip (base.py:566-626: pixels->ndc, crop, rescale, ndc->pixels)."""
    rng = np.random.default_rng(4)
    for _ in range(15):
        w, h = int(rng.integers(200, 800)), int(rng.integers(200, 800))
        out = 224
        x0, y0 = rng.uniform(-30, w - 80, 2)
        s = rng.uniform(50, 300)
        bbox = np.array([x0, y0, x0 + s, y0 + s]).astype(int)
        K = np.array(
            [
                [rng.uniform(300, 900), 0, w / 2 + rng.uniform(-10, 10)],
                [0, rng.uniform(300, 900), h / 2 + rng.uniform(-10, 10)],
                [0, 0, 1.0],
            ]
        )
        fl = torch.tensor([K[0, 0], K[1, 1]], dtype=torch.float32)
        pp = torch.tensor(K[:2, 2], dtype=torch.float32)
        size_wh = torch.tensor([w, h], dtype=torch.float32)
        bbox_xywh = torch.tensor(
            [bbox[0], bbox[1], bbox[2] - bbox[0], bbox[3] - bbox[1]],
            dtype=torch.float32,
        )
        fl_ndc, pp_ndc = ref_ct.convert_pixels_to_ndc(fl, pp, size_wh)
        fl_c, pp_c = ref_ct.adjust_camera_to_bbox_crop_(
            fl_ndc, pp_ndc, size_wh, bbox_xywh
        )
        fl_s, pp_s = ref_ct.adjust_camera_to_image_scale_(
            fl_c, pp_c, bbox_xywh[2:], torch.tensor([out, out], dtype=torch.float32)
        )
        fl_px, pp_px = ref_ct.convert_ndc_to_pixels(
            fl_s, pp_s, torch.tensor([out, out], dtype=torch.float32)
        )
        my_K = myp.adjust_intrinsics_for_crop_resize(K, bbox.astype(np.float64), out)
        np.testing.assert_allclose(
            [my_K[0, 0], my_K[1, 1]], fl_px.numpy(), rtol=1e-4
        )
        np.testing.assert_allclose(
            [my_K[0, 2], my_K[1, 2]], pp_px.numpy(), rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize("representation", ["heatmap", "voting"])
def test_make_bbox_features_golden(ref_bbox_utils, representation):
    rng = np.random.default_rng(5)
    H = W = 64
    bbox2d = rng.uniform(-10, 74, (4, 8, 2)).astype(np.float32)
    ref = ref_bbox_utils.make_bbox_features(
        torch.from_numpy(bbox2d), type=representation, shape=(H, W)
    ).numpy()
    mine = myp.make_bbox_features_np(bbox2d, representation, H, W)
    np.testing.assert_allclose(mine, ref, atol=2e-5, rtol=1e-4)


def test_make_proj_bbox_golden(ref_cam_utils):
    rng = np.random.default_rng(6)
    T = 5
    poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    for i in range(T):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        th = rng.uniform(0, 2)
        Kx = np.array(
            [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]], dtype=np.float64
        )
        poses[i, :3, :3] = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
        poses[i, :3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05), 0.6]
    K = np.tile(
        np.array([[700.0, 0, 112], [0, 700.0, 112], [0, 0, 1]], dtype=np.float32),
        (T, 1, 1),
    )
    pts = rng.uniform(-0.05, 0.05, (T, 8, 3)).astype(np.float32)
    ref = ref_cam_utils.make_proj_bbox(
        torch.from_numpy(poses), torch.from_numpy(K), torch.from_numpy(pts)
    ).numpy()
    mine = np.stack(
        [myp.project_points(K[i], poses[i], pts[i]) for i in range(T)]
    )
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-3)

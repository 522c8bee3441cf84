import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.data.augment import AugmentationConfig, AugmentationProcessor


@pytest.fixture
def proc():
    return AugmentationProcessor(
        AugmentationConfig(
            rgb_aug="ycb",
            rgb_aug_prob=1.0,
            enable_image_rotation=True,
            obj_truncation_ratio=(0.1, 0.3),
            obj_mask_ratio=(0.1, 0.2),
            seed=0,
        )
    )


def sample_image(size=(128, 96)):
    arr = np.zeros((size[1], size[0], 3), np.uint8)
    arr[20:70, 30:90] = [180, 120, 60]
    return Image.fromarray(arr)


def test_photometric_styles_preserve_shape(proc):
    img = sample_image()
    for fn in (proc.apply_dark_aug, proc.apply_mobile_aug, proc.apply_ycb_aug):
        out = fn(img)
        assert out.size == img.size
        assert np.asarray(out).dtype == np.uint8


def test_dark_aug_reduces_brightness(proc):
    img = sample_image()
    out = proc.apply_dark_aug(img)
    assert np.asarray(out).mean() < np.asarray(img).mean()


def test_fda_swaps_low_frequencies(proc):
    img = sample_image()
    ref = Image.fromarray(
        np.full((96, 128, 3), [10, 200, 30], np.uint8)
    )
    out = proc.apply_fda(img, ref, beta=0.05)
    assert out.size == img.size
    # Mean color shifts toward the reference.
    assert abs(np.asarray(out)[..., 1].mean() - np.asarray(ref)[..., 1].mean()) < abs(
        np.asarray(img)[..., 1].mean() - np.asarray(ref)[..., 1].mean()
    )


def test_pose_augmentation_rotates_R_only(proc):
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, :3, 3] = [0.1, 0.2, 0.9]
    out = proc.pose_augmentation_R(poses)
    # Translation unchanged; rotation is a valid rotation; same for all T.
    np.testing.assert_allclose(out[:, :3, 3], poses[:, :3, 3])
    R = out[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(out[1, :3, :3], out[0, :3, :3])


def test_rotate_image_consistency(proc):
    """After rotation, projecting a 3D point with the updated pose/K must
    land on the rotated pixel location of the original projection."""
    from boxdreamer_tpu.data.preprocess import project_points

    K = np.array([[200.0, 0, 64.0], [0, 200.0, 48.0], [0, 0, 1.0]])
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 1.0]
    pt = np.array([[0.05, -0.03, 0.0]])
    img = sample_image()
    uv_before = project_points(K, pose, pt)[0]

    rot_img, new_pose, _, new_K = proc.rotate_image(img, pose, None, K)
    uv_after = project_points(new_K, new_pose, pt)[0]

    # The point's pixel in the rotated image: rotate (uv - c) by the same
    # angle the image content was rotated (PIL rotates CCW in screen coords
    # = CW in math coords with y down).
    # Verify consistency indirectly: distance from principal point preserved.
    c_before = np.array([K[0, 2], K[1, 2]])
    c_after = np.array([new_K[0, 2], new_K[1, 2]])
    np.testing.assert_allclose(
        np.linalg.norm(uv_before - c_before),
        np.linalg.norm(uv_after - c_after),
        rtol=1e-5,
    )


def test_truncation_blacks_out_one_side(proc):
    img = Image.fromarray(np.full((96, 128, 3), 200, np.uint8))
    out = proc.random_truncate_image_with_bbox(img, np.array([20, 20, 100, 80]))
    arr = np.asarray(out)
    assert (arr == 0).any()
    assert (arr == 200).any()


def test_mask_aug_inside_bbox(proc):
    img = Image.fromarray(np.full((96, 128, 3), 200, np.uint8))
    out = proc.random_mask_image_with_bbox(img, None, np.array([20, 20, 100, 80]))
    arr = np.asarray(out)
    zeros = np.argwhere(arr.max(-1) == 0)
    assert len(zeros) > 0
    assert zeros[:, 0].min() >= 20 and zeros[:, 1].min() >= 20


def test_add_background_fills_black(proc):
    img = sample_image()
    bg = Image.fromarray(np.full((96, 128, 3), [0, 0, 250], np.uint8))
    out = np.asarray(proc.add_background(img, bg))
    assert (out[0, 0] == [0, 0, 250]).all()  # black corner replaced
    assert (out[40, 50] == [180, 120, 60]).all()  # object kept


def test_paste_objs_overlap_constraint(proc):
    img = Image.fromarray(np.full((96, 128, 3), 100, np.uint8))
    occ = Image.fromarray(np.full((30, 30, 3), [250, 0, 0], np.uint8))
    out = proc.random_paste_objs(img, [occ], np.array([40, 30, 90, 70]))
    assert out.size == img.size


def test_dataset_with_augmentation(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=6, n_test=2)
    cfg = DatasetConfig(
        image_size=64,
        length=3,
        augmentation=AugmentationConfig(
            rgb_aug="ycb", rgb_aug_prob=1.0, enable_image_rotation=True,
            obj_truncation_ratio=(0.0, 0.2), seed=0,
        ),
        pose_augmentation=True,
    )
    ds = build_dataset("LINEMOD", cfg, "train", root=root)
    batch = ds[0]
    assert batch["images"].shape == (3, 3, 64, 64)
    assert np.isfinite(batch["bbox_feat"]).all()
    # GT consistency preserved under augmentation: stored projection matches
    # projecting bbox_3d with the stored pose/K.
    from boxdreamer_tpu.data.preprocess import project_points

    q = int(batch["query_idx"])
    proj = project_points(
        batch["non_ndc_intrinsics"][q].astype(np.float64),
        batch["poses"][q].astype(np.float64),
        batch["bbox_3d"][q].astype(np.float64),
    )
    stored = (batch["bbox_proj_crop"][q] + 1.0) / 2.0 * 64
    stored = np.clip(stored, -320, 384)
    mask = (np.abs(batch["bbox_proj_crop"][q]) < 5).all(axis=-1)
    np.testing.assert_allclose(proj[mask], stored[mask], atol=1.0)

"""Golden parity: REAL reference camera normalization (camera_transform.py:
92-300 executed with a faithful pytorch3d shim, plus the base.py:628-681
opencv round-trip and rotate-180 fix-up) vs ops/normalize.py.

The repo's closed-form derivation (first_camera == P_i @ inv(P_0), object ==
identity) is verified here against the reference's actual code path instead
of the round-1 paper derivation alone.
"""

import numpy as np
import pytest
import torch

from parity import refshim

from boxdreamer_tpu.ops import normalize as mynorm


def _rand_poses(rng, T):
    poses = np.tile(np.eye(4, dtype=np.float64), (T, 1, 1))
    for i in range(T):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        th = rng.uniform(0.05, 2.5)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        poses[i, :3, :3] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        poses[i, :3, 3] = rng.uniform(-0.1, 0.1, 3) + [0, 0, rng.uniform(0.4, 1.2)]
    return poses


def _ref_normalize_flow(ct, poses, Ks, image_size, coordinate, query_idx):
    """Execute the reference's exact base.py:628-681 normalization block."""
    from pytorch3d.utils.camera_conversions import (
        cameras_from_opencv_projection,
        opencv_from_cameras_projection,
    )

    T = len(poses)
    poses_t = torch.from_numpy(poses).float()
    batchR = poses_t[:, :3, :3].clone()
    batchT = poses_t[:, :3, 3].clone()
    size = torch.tensor(
        [image_size, image_size], dtype=torch.float32
    ).expand(T, 2)
    cameras = cameras_from_opencv_projection(
        batchR, batchT, torch.from_numpy(Ks).float(), size
    )
    normalized, _, scale, coordinate_transform = ct.normalize_cameras(
        cameras,
        points=None,
        first_camera=coordinate == "first_camera",
        compute_optical=False,
        normalize_trans=False,
        max_norm=False,
        query_idx=query_idx,
    )
    batchR, batchT, _ = opencv_from_cameras_projection(normalized, size)
    if coordinate == "first_camera":
        coordinate_transform = poses_t[0].clone()
        rotate_180 = torch.tensor(
            [[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]], dtype=torch.float32
        )
        batchR = batchR @ rotate_180
    else:
        coordinate_transform = torch.eye(4)
    out = poses_t.clone()
    out[:, :3, :3] = batchR
    out[:, :3, 3] = batchT
    return out.numpy(), float(scale), coordinate_transform.numpy()


@pytest.mark.parametrize("coordinate", ["object", "first_camera"])
def test_base_normalization_flow_golden(coordinate):
    ct = refshim.load("src.utils.camera_transform")
    rng = np.random.default_rng(11)
    T = 5
    poses = _rand_poses(rng, T)
    Ks = np.stack(
        [
            np.array([[600.0, 0, 112 + rng.uniform(-8, 8)], [0, 590.0, 112], [0, 0, 1]])
            for _ in range(T)
        ]
    )
    ref_poses, ref_scale, ref_ct = _ref_normalize_flow(
        ct, poses, Ks, 224, coordinate, query_idx=T - 1
    )
    my_poses, _, my_scale, my_ct = mynorm.normalize_cameras(
        poses.astype(np.float32),
        query_idx=T - 1,
        first_camera=coordinate == "first_camera",
    )
    np.testing.assert_allclose(np.asarray(my_poses), ref_poses, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(my_scale), ref_scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(my_ct), ref_ct, atol=1e-6)
    if coordinate == "object":
        np.testing.assert_allclose(np.asarray(my_poses), poses, atol=1e-5)


def test_normalize_translation_golden():
    """normalize_trans=True path: reference normalize_translation
    (camera_transform.py:263-300) ref-selection rules + scale."""
    ct = refshim.load("src.utils.camera_transform")
    from pytorch3d.renderer.cameras import PerspectiveCameras

    rng = np.random.default_rng(13)
    for T, query_idx, first_camera, max_norm in [
        (6, 5, True, False),
        (6, 0, True, False),
        (2, 1, True, False),
        (5, 2, False, False),
        (5, 4, True, True),
    ]:
        poses = _rand_poses(rng, T)
        t = torch.from_numpy(poses[:, :3, 3]).float()
        cams = PerspectiveCameras(
            R=torch.from_numpy(poses[:, :3, :3]).float().permute(0, 2, 1),
            T=t.clone(),
        )
        _, _, ref_scale = ct.normalize_translation(
            cams,
            points=None,
            max_norm=max_norm,
            query_idx=query_idx,
            first_camera=first_camera,
        )
        my_scale = mynorm.translation_scale(
            poses.astype(np.float32),
            query_idx=query_idx,
            first_camera=first_camera,
            max_norm=max_norm,
        )
        np.testing.assert_allclose(
            float(my_scale), float(ref_scale), rtol=1e-5, err_msg=str((T, query_idx))
        )


def test_compute_optical_golden():
    """compute_optical=True path: reference compute_optical_transform
    (camera_transform.py:137-163, intersect_skew_lines lstsq) vs my
    closed-form optical normalization."""
    ct = refshim.load("src.utils.camera_transform")
    from pytorch3d.utils.camera_conversions import (
        cameras_from_opencv_projection,
        opencv_from_cameras_projection,
    )

    rng = np.random.default_rng(17)
    T = 5
    # Cameras roughly looking at the origin so axes nearly intersect.
    poses = _rand_poses(rng, T)
    Ks = np.tile(
        np.array([[500.0, 0, 112.0], [0, 500.0, 112.0], [0, 0, 1.0]]), (T, 1, 1)
    )
    size = torch.tensor([224.0, 224.0]).expand(T, 2)
    cams = cameras_from_opencv_projection(
        torch.from_numpy(poses[:, :3, :3]).float(),
        torch.from_numpy(poses[:, :3, 3]).float(),
        torch.from_numpy(Ks).float(),
        size,
    )
    new_cams, _, ref_scale = ct.compute_optical_transform(cams.clone(), points=None)
    refR, refT, _ = opencv_from_cameras_projection(new_cams, size)

    import jax.numpy as jnp

    my_poses, _, my_scale = mynorm.optical_normalize(jnp.asarray(poses, jnp.float32))
    np.testing.assert_allclose(float(my_scale), float(ref_scale), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(my_poses)[:, :3, 3], refT.numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(my_poses)[:, :3, :3], refR.numpy(), atol=1e-4
    )

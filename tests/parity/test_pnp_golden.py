"""Golden parity: REAL reference PnP path (box_utils.py:113-199, executing
cv2.solvePnP with the forced RANSAC fallback) vs ops/pnp.solve_pnp.

The voting representation decodes to the exact mean of the vote field, so we
can construct vote maps whose decoded keypoints equal arbitrary target
pixels — this drives the reference's full recover_pose_from_bb8 (decode +
cv2 ITERATIVE solve) and my batched DLT+GN on identical observations.
"""

import numpy as np
import pytest
import torch

from parity import refshim

from boxdreamer_tpu.ops import pnp as pnp_ops


def _rot(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array(
        [
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _scene(rng, n_poses):
    """Random box corners + world->camera poses + intrinsics, with the box
    projecting inside a 224x224 crop."""
    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
        dtype=np.float64,
    ) * rng.uniform(0.04, 0.08, (n_poses, 1, 1))
    poses, Ks, pts2d = [], [], []
    for i in range(n_poses):
        R = _rot(rng.normal(size=3), rng.uniform(0.1, 2.0))
        t = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02), 0.5])
        K = np.array([[600.0, 0, 112.0], [0, 600.0, 112.0], [0, 0, 1.0]])
        cam = corners[i] @ R.T + t
        proj = cam @ K.T
        uv = proj[:, :2] / proj[:, 2:3]
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = t
        poses.append(pose)
        Ks.append(K)
        pts2d.append(uv)
    return np.stack(corners), np.stack(poses), np.stack(Ks), np.stack(pts2d)


def _votes_for_targets(targets: np.ndarray, H: int, W: int) -> np.ndarray:
    """(8, 2) target pixels -> (H, W, 8, 2) normalized vote offsets such that
    recover_bb8_corners('voting') decodes exactly to the targets."""
    cx = np.arange(W)[None, :, None]  # broadcast over H, corners
    cy = np.arange(H)[:, None, None]
    dx = (targets[None, None, :, 0] - cx) / W
    dy = (targets[None, None, :, 1] - cy) / H
    return np.stack([np.broadcast_to(dx, (H, W, 8)), np.broadcast_to(dy, (H, W, 8))], axis=-1)


def _angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


@pytest.mark.parametrize("noise_px", [0.0, 1.5])
def test_pose_solve_matches_reference_cv2(noise_px):
    bu = refshim.load("src.models.utils.box_utils")
    rng = np.random.default_rng(7 if noise_px else 3)
    H = W = 224
    B, T = 2, 2
    corners, poses, Ks, pts2d = _scene(rng, B * T)
    pts2d = pts2d + rng.normal(0, noise_px, pts2d.shape)

    bbox_feat = np.stack(
        [_votes_for_targets(pts2d[i], H, W) for i in range(B * T)]
    ).reshape(B, T, H, W, 8, 2)
    bbox_3d = corners.reshape(B, T, 8, 3)
    K4 = Ks.reshape(B, T, 3, 3)

    ref_poses, ref_norm_kpts = bu.recover_pose_from_bb8(
        torch.from_numpy(bbox_feat).float(),
        torch.from_numpy(bbox_3d).float(),
        torch.from_numpy(K4).float(),
        "voting",
    )
    ref_poses = ref_poses.numpy()

    # Reference decode yielded the targets; verify then solve mine on them.
    decoded = (ref_norm_kpts.numpy() + 1) / 2 * np.array([W, H])
    np.testing.assert_allclose(
        decoded.reshape(B * T, 8, 2), pts2d, atol=1e-3, rtol=1e-5
    )
    my_poses = np.asarray(
        pnp_ops.solve_pnp(bbox_3d, pts2d.reshape(B, T, 8, 2), K4, iters=20)
    )

    for i in range(B * T):
        r = ref_poses.reshape(-1, 4, 4)[i]
        m = my_poses.reshape(-1, 4, 4)[i]
        gt = poses[i]
        assert _angle_deg(r[:3, :3], m[:3, :3]) < (0.3 if noise_px else 0.05), i
        np.testing.assert_allclose(
            m[:3, 3], r[:3, 3], atol=(2e-3 if noise_px else 1e-4), rtol=5e-3
        )
        # and both near ground truth when noiseless
        if not noise_px:
            assert _angle_deg(m[:3, :3], gt[:3, :3]) < 0.05

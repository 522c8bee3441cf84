"""Reconstruction geometry: similarity alignment, coordinate conversion,
outlier pruning.

Numpy equivalents of the reference BaseReconstructor's geometric core
(src/reconstruction/base.py:106-744): Umeyama similarity alignment,
camera-extrinsics alignment of an estimated pose set onto GT coordinates,
world->object coordinate conversion, and statistical self-pruning of
reconstructed points.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = True
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Similarity transform (s, R, t) minimizing ||dst - (s R src + t)||
    (reference _umeyama_alignment, base.py:208).

    Args:
        src, dst: (N, 3) corresponding points.

    Returns:
        (scale, R (3,3), t (3,)).
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def align_camera_extrinsics(
    est_poses: np.ndarray, gt_poses: np.ndarray, with_scale: bool = True
) -> Tuple[float, np.ndarray]:
    """Similarity transform mapping estimated camera centers onto GT centers
    (reference _align_camera_extrinsics, base.py:106): returns (scale, T)
    such that GT-world point x_gt ~ T @ [s * x_est; 1].

    Args:
        est_poses, gt_poses: (N, 4, 4) world->camera.
    """
    def centers(poses):
        R = poses[:, :3, :3]
        t = poses[:, :3, 3]
        return -np.einsum("nji,nj->ni", R, t)

    s, R, t = umeyama_alignment(centers(est_poses), centers(gt_poses), with_scale)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return s, T


def apply_similarity(points: np.ndarray, s: float, T: np.ndarray) -> np.ndarray:
    """Apply x -> T @ (s * x)."""
    return (s * points) @ T[:3, :3].T + T[:3, 3]


def to_object_coordinate(points: np.ndarray, gt_pose: np.ndarray) -> np.ndarray:
    """World points -> the object's coordinate frame via a GT world->camera
    pose whose world IS the object frame (reference _to_object_coordinate,
    base.py:481): identity when reconstruction is already aligned to GT."""
    # If reconstruction world == camera frame of `gt_pose`, object coords are
    # obtained by the inverse pose.
    R = gt_pose[:3, :3]
    t = gt_pose[:3, 3]
    return (points - t) @ R


def self_prune(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    std_ratio: float = 2.0,
    k: int = 8,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Statistical outlier removal: drop points whose mean k-NN distance is
    more than ``std_ratio`` std devs above the average (reference
    _self_pruning, base.py:633 via open3d; brute-force numpy here)."""
    n = len(points)
    if n <= k + 1:
        return points, colors
    # kNN statistics against a subsample (statistically equivalent for
    # outlier detection and keeps the brute-force O(n * m) cheap).
    m = min(n, 4096)
    rng = np.random.default_rng(0)
    ref = points[rng.choice(n, size=m, replace=False)].astype(np.float32)
    ref_sq = (ref**2).sum(-1)
    pts32 = points.astype(np.float32)
    mean_knn = np.empty(n, dtype=np.float32)
    chunk = 4096
    for i in range(0, n, chunk):
        p = pts32[i : i + chunk]
        d2 = (p**2).sum(-1)[:, None] + ref_sq[None, :] - 2.0 * p @ ref.T
        kk = min(k + 1, m - 1)
        part = np.partition(d2, kk, axis=1)[:, 1 : kk + 1]
        mean_knn[i : i + chunk] = np.sqrt(np.maximum(part, 0)).mean(1)
    thresh = mean_knn.mean() + std_ratio * mean_knn.std()
    keep = mean_knn <= thresh
    return points[keep], (colors[keep] if colors is not None else None)

"""Visual-hull (silhouette carving) reconstructor — built-in backend.

No equivalent exists in the reference (which depends on the external DUSt3R
submodule for reconstruction); this backend exists so the full pipeline —
reference DB -> 3D box -> pose estimation — runs with zero external models:
given posed reference crops with foreground masks (or dark-background
crops, which the BoxDreamer preprocessing produces via mask_bg), carve a
voxel grid by projecting into every view and keeping voxels that land on
foreground everywhere. The surviving voxel centers are the point cloud;
their axis-aligned box is the 3D bounding box the pose pipeline consumes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from boxdreamer_tpu.reconstruction.base import BaseReconstructor


def _foreground_mask(image: np.ndarray, threshold: float = 0.05) -> np.ndarray:
    """(3, H, W) [0,1] -> (H, W) bool via luminance (crops are black-bg)."""
    lum = 0.299 * image[0] + 0.587 * image[1] + 0.114 * image[2]
    return lum > threshold


class VisualHullReconstructor(BaseReconstructor):
    name = "carve"

    def __init__(
        self,
        resolution: int = 64,
        bound_scale: float = 1.2,
        min_views_frac: float = 0.95,
        prune_std_ratio: float = 2.0,
    ):
        super().__init__(prune_std_ratio=prune_std_ratio)
        self.resolution = resolution
        self.bound_scale = bound_scale
        self.min_views_frac = min_views_frac

    def _estimate_bounds(self) -> float:
        """Working-volume half-extent from camera-ray geometry: the object
        sits near the optical-axis intersection; bound by the median
        camera distance times the largest mask angular extent."""
        dists = []
        for pose in self.gt_poses:
            R, t = pose[:3, :3], pose[:3, 3]
            dists.append(np.linalg.norm(-R.T @ t))
        d = float(np.median(dists))
        extents = []
        for img, K in zip(self.images, self.intrinsics):
            mask = _foreground_mask(img)
            ys, xs = np.nonzero(mask)
            if len(xs) == 0:
                continue
            w = (xs.max() - xs.min()) / K[0, 0]
            h = (ys.max() - ys.min()) / K[1, 1]
            extents.append(max(w, h) * d / 2.0)
        return self.bound_scale * (max(extents) if extents else 0.5 * d)

    def reconstruct(self):
        n = self.resolution
        half = self._estimate_bounds()
        lin = np.linspace(-half, half, n)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        voxels = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

        votes = np.zeros(len(voxels), dtype=np.int32)
        valid_views = 0
        color_acc = np.zeros((len(voxels), 3), dtype=np.float64)
        for img, mask_arr, K, pose in zip(
            self.images, self.masks, self.intrinsics, self.gt_poses
        ):
            H, W = img.shape[-2:]
            if mask_arr is not None:
                mask = np.asarray(mask_arr).reshape(H, W) > 0.5
            else:
                mask = _foreground_mask(img)
            if not mask.any():
                continue
            valid_views += 1
            cam = voxels @ pose[:3, :3].T + pose[:3, 3]
            z = cam[:, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                u = K[0, 0] * cam[:, 0] / z + K[0, 2]
                v = K[1, 1] * cam[:, 1] / z + K[1, 2]
            ui = np.round(u).astype(np.int64)
            vi = np.round(v).astype(np.int64)
            inside = (z > 1e-6) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
            fg = np.zeros(len(voxels), dtype=bool)
            fg[inside] = mask[vi[inside], ui[inside]]
            votes += fg.astype(np.int32)
            sel = fg & inside
            color_acc[sel] += img[:, vi[sel], ui[sel]].T

        need = int(np.ceil(self.min_views_frac * max(valid_views, 1)))
        keep = votes >= max(need, 1)
        if not keep.any():
            # Fall back to the most-voted 1% of voxels.
            thresh = np.percentile(votes, 99)
            keep = votes >= max(thresh, 1)
        self.points = voxels[keep]
        counts = np.maximum(votes[keep, None], 1)
        self.colors = np.clip(color_acc[keep] / counts * 255.0, 0, 255)

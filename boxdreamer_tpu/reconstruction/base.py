"""Reconstructor base: data ingestion, alignment, pruning, export.

Equivalent of the reference BaseReconstructor (src/reconstruction/base.py:
13-744): accumulates per-object reference images/masks/intrinsics/GT poses
(batch ingestion from a dataloader via set_processed_data:64-83), runs the
backend-specific ``reconstruct``, aligns the result to the GT coordinate
frame, prunes outliers, and writes the colored PLY + 3D box.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from boxdreamer_tpu.data.ply import write_ply
from boxdreamer_tpu.data.preprocess import bbox_corners_from_points
from boxdreamer_tpu.reconstruction import geometry
from boxdreamer_tpu.utils.log import INFO


class BaseReconstructor:
    name = "base"

    def __init__(self, prune_std_ratio: float = 2.0):
        self.prune_std_ratio = prune_std_ratio
        self.reset()

    def reset(self):
        self.images: List[np.ndarray] = []  # (3, H, W) float [0,1]
        self.masks: List[Optional[np.ndarray]] = []
        self.intrinsics: List[np.ndarray] = []
        self.gt_poses: List[np.ndarray] = []
        self.points: Optional[np.ndarray] = None
        self.colors: Optional[np.ndarray] = None

    # ------------------------------------------------------------- ingestion

    def set_processed_data(self, batch: Dict[str, np.ndarray]) -> None:
        """Ingest one dataloader batch dict (reference set_processed_data,
        base.py:64-83): uses images / image_masks / non_ndc_intrinsics /
        poses of every frame."""
        images = np.asarray(batch["images"])
        masks = np.asarray(batch.get("image_masks")) if "image_masks" in batch else None
        Ks = np.asarray(batch["non_ndc_intrinsics"])
        poses = np.asarray(batch["poses"])
        if images.ndim == 5:  # (B, T, ...) -> flatten
            images = images.reshape((-1,) + images.shape[2:])
            Ks = Ks.reshape((-1, 3, 3))
            poses = poses.reshape((-1, 4, 4))
            if masks is not None:
                masks = masks.reshape((-1,) + masks.shape[2:])
        for i in range(len(images)):
            self.images.append(images[i].astype(np.float32))
            self.masks.append(masks[i] if masks is not None else None)
            self.intrinsics.append(Ks[i].astype(np.float64))
            self.gt_poses.append(poses[i].astype(np.float64))

    # ----------------------------------------------------------- reconstruct

    def reconstruct(self):
        """Backend hook: set self.points (N, 3) (+ self.colors)."""
        raise NotImplementedError

    def run(self, output_ply: Optional[str] = None) -> Dict[str, np.ndarray]:
        """Full pipeline: reconstruct -> prune -> export
        (reference run, base.py:33)."""
        assert self.images, "no data ingested"
        self.reconstruct()
        assert self.points is not None, "backend produced no points"
        n_before = len(self.points)
        self.points, self.colors = geometry.self_prune(
            self.points, self.colors, std_ratio=self.prune_std_ratio
        )
        INFO(f"{self.name}: {n_before} -> {len(self.points)} points after pruning")
        bbox_3d = bbox_corners_from_points(self.points)
        if output_ply:
            os.makedirs(os.path.dirname(output_ply) or ".", exist_ok=True)
            write_ply(output_ply, self.points, self.colors)
            np.savetxt(
                os.path.join(os.path.dirname(output_ply), "box3d_corners.txt"),
                bbox_3d,
            )
        return {"points": self.points, "colors": self.colors, "bbox_3d": bbox_3d}

    # --------------------------------------------------------------- helpers

    def align_to_gt(self, est_poses: np.ndarray) -> None:
        """Align backend points (in the backend's world) to the GT coordinate
        frame via camera-center Umeyama (reference _align_camera_extrinsics +
        point registration, base.py:106-208)."""
        gt = np.stack(self.gt_poses)
        s, T = geometry.align_camera_extrinsics(est_poses, gt)
        self.points = geometry.apply_similarity(self.points, s, T)

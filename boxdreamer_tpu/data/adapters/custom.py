"""Custom dataset for the demo pipeline.

Equivalent of the reference CustomDataset (src/datasets/custom.py:37-165):
reference/query data are injected programmatically (paths or arrays) by the
demo pipeline after segmentation + reconstruction, instead of discovered on
disk. Layout contract for file mode: a directory of ``<id>-color.png`` with
sibling ``<id>-pose.txt`` / ``<id>-intrinsics.txt`` (demo writes these,
reference demo.py:1409-1425) plus an optional ``bbox.txt`` 3D box.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Sequence

import numpy as np

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


class CustomDataset(BaseDataset):
    dataset = "custom"

    def __init__(self, config: DatasetConfig, split: str = "test"):
        super().__init__(config, split)
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).update({"ref": {}, split: {}})
        self._bbox3d: Optional[np.ndarray] = None

    # Setter-style API mirroring the reference's set_*(…) methods
    # (custom.py:57-130).

    def set_references(
        self,
        image_paths: Sequence[str],
        pose_paths: Sequence[str],
        intrinsic_paths: Sequence[str],
        cat: str = "object",
    ):
        self.images["ref"][cat] = list(image_paths)
        self.poses["ref"][cat] = list(pose_paths)
        self.intrinsics["ref"][cat] = list(intrinsic_paths)
        self.boxes["ref"][cat] = [None] * len(image_paths)
        self.cat_len["ref"][cat] = len(image_paths)

    def set_queries(
        self,
        image_paths: Sequence[str],
        intrinsic_paths: Sequence[str],
        cat: str = "object",
        pose_paths: Optional[Sequence[str]] = None,
    ):
        n = len(image_paths)
        self.images[self.split][cat] = list(image_paths)
        self.intrinsics[self.split][cat] = list(intrinsic_paths)
        # Query poses unknown at demo time: identity placeholders.
        self.poses[self.split][cat] = list(pose_paths) if pose_paths else ["__eye__"] * n
        self.boxes[self.split][cat] = [None] * n
        self.cat_len[self.split][cat] = n

    def set_bbox3d(self, corners: np.ndarray):
        self._bbox3d = np.asarray(corners, dtype=np.float64).reshape(8, 3)

    def get_bbox3d(self, cat: str):
        if self._bbox3d is not None:
            return self._bbox3d
        return super().get_bbox3d(cat)

    def read_pose(self, path: str) -> np.ndarray:
        if path == "__eye__":
            return np.eye(4)
        return super().read_pose(path)

    @classmethod
    def from_directory(
        cls,
        config: DatasetConfig,
        ref_dir: str,
        query_dir: str,
        bbox3d_path: Optional[str] = None,
    ) -> "CustomDataset":
        """Build from demo-pipeline output directories."""
        ds = cls(config)

        def collect(d):
            imgs = sorted(glob.glob(os.path.join(d, "*-color.png")))
            poses = [p.replace("-color.png", "-pose.txt") for p in imgs]
            Ks = [p.replace("-color.png", "-intrinsics.txt") for p in imgs]
            return imgs, poses, Ks

        r_imgs, r_poses, r_Ks = collect(ref_dir)
        q_imgs, q_poses, q_Ks = collect(query_dir)
        ds.set_references(r_imgs, r_poses, r_Ks)
        ds.set_queries(
            q_imgs,
            q_Ks,
            pose_paths=[p if os.path.exists(p) else "__eye__" for p in q_poses],
        )
        if bbox3d_path and os.path.exists(bbox3d_path):
            ds.set_bbox3d(np.loadtxt(bbox3d_path))
        return ds

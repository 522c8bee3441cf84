"""Objaverse synthetic-render adapter.

The reference trains on Blender-rendered Objaverse views
(src/datasets/objaverse.py:28-539 + the renderer
src/datasets/utils/objaverse_utils/scripts/rendering.py) with per-object
``bbox_3d/<obj>.txt`` boxes, optional SUN2012 background replacement, and
occluder pasting. This adapter consumes the rendered per-frame layout

    <render_root>/<shard>/<obj>/<render_type>/ with color/<n>.png,
    pose/<n>.txt, intrinsics/<n>.txt

(the renderer in scripts/tools emits this flat txt form) plus
``bbox_3d/<obj>.txt`` at the root. Background/occluder augmentation is
wired through data/augment.py.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


class ObjaverseDataset(BaseDataset):
    dataset = "objaverse"

    def __init__(
        self,
        config: DatasetConfig,
        split: str,
        root: str,
        render_subdir: str = "objaverse_render/_v0",
        render_type: str = "random",
    ):
        super().__init__(config, split)
        self.root = root
        self.render_root = os.path.join(root, render_subdir)
        self.bbox3d_root = os.path.join(root, "bbox_3d")
        self.bg_root = os.path.join(root, "SUN2012pascalformat")
        self.render_type = render_type
        self.load_data()

    def _frame_files(self, obj_dir: str):
        color = sorted(glob.glob(os.path.join(obj_dir, "color", "*.png")))
        poses, Ks, keep = [], [], []
        for img in color:
            stem = os.path.splitext(os.path.basename(img))[0]
            p = os.path.join(obj_dir, "pose", stem + ".txt")
            k = os.path.join(obj_dir, "intrinsics", stem + ".txt")
            if os.path.exists(p) and os.path.exists(k):
                keep.append(img)
                poses.append(p)
                Ks.append(k)
        return keep, poses, Ks

    def load_data(self):
        split = self.split
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        self.bbox_3d_paths.setdefault(split, {})
        if not os.path.isdir(self.render_root):
            return
        for shard in sorted(os.listdir(self.render_root)):
            shard_dir = os.path.join(self.render_root, shard)
            if not os.path.isdir(shard_dir):
                continue
            for obj in sorted(os.listdir(shard_dir)):
                obj_dir = os.path.join(shard_dir, obj, self.render_type)
                if not os.path.isdir(obj_dir):
                    obj_dir = os.path.join(shard_dir, obj)
                imgs, poses, Ks = self._frame_files(obj_dir)
                if not imgs:
                    continue
                self.images[split][obj] = imgs
                self.poses[split][obj] = poses
                self.intrinsics[split][obj] = Ks
                self.boxes[split][obj] = [None] * len(imgs)
                self.cat_len[split][obj] = len(imgs)
                box3d = os.path.join(self.bbox3d_root, f"{obj}.txt")
                if os.path.exists(box3d):
                    self.bbox_3d_paths[split][obj] = box3d
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = getattr(self, table)[split]
        self.bbox_3d_paths["ref"] = self.bbox_3d_paths[split]
        if split == "train":
            # SUN2012 background replacement pool for augmentation
            # (reference objaverse.py:438-460 + aug add_background).
            self.bg_image_paths = self.background_images()

    def background_images(self):
        """SUN2012 background pool for augmentation (reference
        objaverse.py:438-460)."""
        index = os.path.join(
            self.bg_root,
            "ImageSets/Main",
            "train.txt" if self.split == "train" else "test.txt",
        )
        if not os.path.exists(index):
            return []
        with open(index) as f:
            names = [ln.split()[0] for ln in f if ln.strip()]
        return [
            os.path.join(self.bg_root, "JPEGImages", n + ".jpg") for n in names
        ]

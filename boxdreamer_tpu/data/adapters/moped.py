"""MOPED adapter.

Layout contract (reference src/datasets/moped.py:40-278): the root holds
``reference/`` and ``test/`` with ``<obj>/<seq>/`` dirs containing

    color/<n>.jpg, mask/<n>.png, pose/<n>.txt, intrinsics/<n>.txt

and ``models/<obj>.ply``. 2D boxes come from the mask images (the reference
uses cv2.boundingRect, bbox_utils.extract_bboxes:13-34 — here PIL+numpy).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from PIL import Image

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


class MOPEDDataset(BaseDataset):
    dataset = "moped"

    def __init__(self, config: DatasetConfig, split: str, root: str):
        super().__init__(config, split)
        self.root = root
        self.model_root = os.path.join(root, "models")
        self.train_root = os.path.join(root, "reference")
        self.test_root = os.path.join(root, "test")
        self.load_data()

    def load_data(self):
        self._load_split("train", self.train_root)
        if self.split in ("val", "test"):
            self._load_split(self.split, self.test_root)
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = getattr(self, table)["train"]
        if os.path.isdir(self.model_root):
            for f in sorted(glob.glob(os.path.join(self.model_root, "*.ply"))):
                self.model_paths[os.path.splitext(os.path.basename(f))[0]] = f

    def _load_split(self, split: str, root: str):
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        if not os.path.isdir(root):
            return
        for obj in sorted(os.listdir(root)):
            obj_dir = os.path.join(root, obj)
            if not os.path.isdir(obj_dir):
                continue
            imgs, boxes, poses, Ks = [], [], [], []
            for seq in sorted(os.listdir(obj_dir)):
                seq_dir = os.path.join(obj_dir, seq)
                color = sorted(glob.glob(os.path.join(seq_dir, "color", "*.jpg")))
                for img in color:
                    stem = os.path.splitext(os.path.basename(img))[0]
                    mask = os.path.join(seq_dir, "mask", stem + ".png")
                    pose = os.path.join(seq_dir, "pose", stem + ".txt")
                    K = os.path.join(seq_dir, "intrinsics", stem + ".txt")
                    if all(os.path.exists(p) for p in (mask, pose, K)):
                        imgs.append(img)
                        boxes.append(mask)
                        poses.append(pose)
                        Ks.append(K)
            if imgs:
                self.images[split][obj] = imgs
                self.boxes[split][obj] = boxes
                self.poses[split][obj] = poses
                self.intrinsics[split][obj] = Ks
                self.cat_len[split][obj] = len(imgs)

    def read_box(self, path: str, split=None):
        """Boxes come from mask PNGs: bounding rect of nonzero pixels."""
        if path is None or not path.endswith(".png"):
            return super().read_box(path, split)
        mask = np.asarray(Image.open(path).convert("L"))
        ys, xs = np.nonzero(mask > 0)
        if len(xs) == 0:
            return None
        return np.array(
            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], dtype=np.float64
        )

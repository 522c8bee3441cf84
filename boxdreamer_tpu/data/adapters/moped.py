"""MOPED adapter.

Layout contract (reference src/datasets/moped.py:57-278): the root holds
``reference/`` and ``test/`` with ``<obj>/<seq>/`` dirs containing

    color/<n>.jpg, mask/<n>.png, pose/<n>.txt, intrinsics/<n>.txt

and per-sequence point clouds ``models/<prefix>-<obj>-<seq>.ply``.
Categories are per-sequence, keyed ``reference-<obj>-<seq>`` (train) /
``test-<obj>-<seq>`` (eval) exactly like the reference; with the default
``ref_mode='same_seq'`` the reference DB is the eval split itself (each
MOPED sequence carries its own reconstructed point cloud), and
``'random_seq'`` swaps in a random ``reference-<obj>-*`` sequence.
2D boxes come from the mask images (reference read_boxes:250-278 —
cv2-free bounding rect with INCLUSIVE max indices)."""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from PIL import Image

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


class MOPEDDataset(BaseDataset):
    dataset = "moped"

    def __init__(
        self,
        config: DatasetConfig,
        split: str,
        root: str,
        ref_mode: str = "same_seq",  # reference moped.py:76
    ):
        super().__init__(config, split)
        self.root = root
        self.model_root = os.path.join(root, "models")
        self.train_root = os.path.join(root, "reference")
        self.test_root = os.path.join(root, "test")
        self.ref_mode = ref_mode
        self.load_data()

    def load_data(self):
        self._load_split("train", self.train_root)
        if self.split in ("val", "test"):
            self._load_split(self.split, self.test_root)
        # ref tables mirror the CURRENT split (same_seq default): each MOPED
        # sequence is its own reference DB (reference moped.py:96-102).
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = dict(getattr(self, table)[self.split])
        if self.split in ("val", "test") and self.ref_mode == "random_seq":
            for cat in list(self.images[self.split].keys()):
                obj = cat.split("-")[1]
                ref_keys = [
                    k
                    for k in self.images["train"]
                    if k.split("-")[0] == "reference" and k.split("-")[1] == obj
                ]
                if not ref_keys:
                    continue
                pick = ref_keys[int(self._rng.integers(0, len(ref_keys)))]
                for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
                    getattr(self, table)["ref"][cat] = getattr(self, table)["train"][
                        pick
                    ]

    def _load_split(self, split: str, root: str):
        prefix = "reference" if split == "train" else "test"
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        if not os.path.isdir(root):
            return
        for obj in sorted(os.listdir(root)):
            obj_dir = os.path.join(root, obj)
            if not os.path.isdir(obj_dir):
                continue
            for seq in sorted(os.listdir(obj_dir)):
                seq_dir = os.path.join(obj_dir, seq)
                imgs, boxes, poses, Ks = [], [], [], []
                color = sorted(glob.glob(os.path.join(seq_dir, "color", "*.jpg")))
                for img in color:
                    stem = os.path.splitext(os.path.basename(img))[0]
                    mask = os.path.join(seq_dir, "mask", stem + ".png")
                    pose = os.path.join(seq_dir, "pose", stem + ".txt")
                    K = os.path.join(seq_dir, "intrinsics", stem + ".txt")
                    # The reference drops frames without a mask
                    # (moped.py:194-210 filters by mask presence).
                    if all(os.path.exists(p) for p in (mask, pose, K)):
                        imgs.append(img)
                        boxes.append(mask)
                        poses.append(pose)
                        Ks.append(K)
                if imgs:
                    cat = f"{prefix}-{obj}-{seq}"
                    self.images[split][cat] = imgs
                    self.boxes[split][cat] = boxes
                    self.poses[split][cat] = poses
                    self.intrinsics[split][cat] = Ks
                    self.cat_len[split][cat] = len(imgs)

    def get_model_path(self, cat: str) -> Optional[str]:
        """Per-sequence point cloud models/<cat>.ply (moped.py:247-248);
        falls back to a per-object models/<obj>.ply."""
        per_seq = os.path.join(self.model_root, cat + ".ply")
        if os.path.exists(per_seq):
            return per_seq
        parts = cat.split("-")
        if len(parts) >= 2:
            per_obj = os.path.join(self.model_root, parts[1] + ".ply")
            if os.path.exists(per_obj):
                return per_obj
        return None

    def read_box(self, path: str, split=None):
        """Boxes come from mask PNGs: bounding rect of nonzero pixels with
        INCLUSIVE max indices ([cmin, rmin, cmax, rmax], reference
        moped.py:264-274 — note no +1)."""
        if path is None or not path.endswith(".png"):
            return super().read_box(path, split)
        mask = np.asarray(Image.open(path).convert("L"))
        ys, xs = np.nonzero(mask > 0)
        if len(xs) == 0:
            return None
        # INTEGER dtype is load-bearing: the reference stacks all boxes into
        # one int ndarray, so its projected-box replacement TRUNCATES to int
        # on assignment (base.py:474) — process_sequence mirrors that when
        # every box is integer-typed.
        return np.array([xs.min(), ys.min(), xs.max(), ys.max()], dtype=np.int64)

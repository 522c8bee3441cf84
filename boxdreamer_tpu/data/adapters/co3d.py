"""CO3D-v2 adapter.

Layout contract (reference src/datasets/co3d.py:27-267): the root holds
``co3d_train/`` and ``co3d_test/`` with ``<cat>/<seq>/images/frameNNNNNN.jpg``
plus per-frame camera files. The reference converts each frame's
``frameNNNNNN.npz`` (R, T, K in PyTorch3D convention from its CO3D
preprocessing) into ``*_pose.txt`` / ``*_intrinsic.txt`` on first load
(co3d.py:120-160); this adapter consumes those txt files and performs the
same one-time npz conversion when only npz files exist. Selected sequences
come from ``selected_seqs_{train,test}.json``; CO3D poses are cam2world and
get inverted here (reference base.py:414-416 inverts for co3d).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


class CO3DDataset(BaseDataset):
    dataset = "co3d"

    def __init__(self, config: DatasetConfig, split: str, root: str):
        super().__init__(config, split)
        self.root = root
        self.train_root = os.path.join(root, "co3d_train")
        self.test_root = os.path.join(root, "co3d_test")
        self.train_root_raw = os.path.join(root, "co3d_train_raw")
        self.test_root_raw = os.path.join(root, "co3d_test_raw")
        self.load_data()

    def _selected_seqs(self, root: str, split: str):
        name = "selected_seqs_train.json" if split == "train" else "selected_seqs_test.json"
        path = os.path.join(root, name)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        # Fallback: every sequence on disk.
        out = {}
        for cat in sorted(os.listdir(root)):
            d = os.path.join(root, cat)
            if os.path.isdir(d):
                out[cat] = [s for s in sorted(os.listdir(d)) if os.path.isdir(os.path.join(d, s))]
        return out

    @staticmethod
    def _convert_npz(npz_path: str):
        pose_file = npz_path.replace(".npz", "_pose.txt")
        K_file = npz_path.replace(".npz", "_intrinsic.txt")
        if os.path.exists(pose_file) and os.path.exists(K_file):
            return pose_file, K_file
        data = np.load(npz_path)
        pose = np.eye(4)
        pose[:3, :3] = data["R"].reshape(3, 3)
        pose[:3, 3] = data["T"].reshape(3)
        np.savetxt(pose_file, pose)
        np.savetxt(K_file, data["K"].reshape(3, 3))
        return pose_file, K_file

    def load_data(self):
        split = self.split
        root = self.train_root if split == "train" else self.test_root
        raw_root = self.train_root_raw if split == "train" else self.test_root_raw
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        if not os.path.isdir(root):
            return
        for cat, seqs in self._selected_seqs(root, split).items():
            for seq in seqs:
                seq_dir = os.path.join(root, cat, seq)
                img_dir = os.path.join(seq_dir, "images")
                if not os.path.isdir(img_dir):
                    continue
                key = f"{cat}_{seq}"
                imgs = sorted(glob.glob(os.path.join(img_dir, "frame*.jpg")))
                poses, Ks, keep = [], [], []
                for img in imgs:
                    stem = os.path.splitext(img)[0]
                    if os.path.exists(stem + "_pose.txt"):
                        poses.append(stem + "_pose.txt")
                        Ks.append(stem + "_intrinsic.txt")
                        keep.append(img)
                    elif os.path.exists(stem + ".npz"):
                        p, k = self._convert_npz(stem + ".npz")
                        poses.append(p)
                        Ks.append(k)
                        keep.append(img)
                if not keep:
                    continue
                self.images[split][key] = keep
                self.poses[split][key] = poses
                self.intrinsics[split][key] = Ks
                self.boxes[split][key] = [None] * len(keep)
                self.cat_len[split][key] = len(keep)
                ply = os.path.join(raw_root, cat, seq, "pointcloud.ply")
                if os.path.exists(ply):
                    self.model_paths[key] = ply
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = getattr(self, table)[split]

    def read_pose(self, path: str) -> np.ndarray:
        # CO3D stores cam2world; the pipeline wants world2cam
        # (reference base.py:414-416).
        pose = super().read_pose(path)
        return np.linalg.inv(pose)

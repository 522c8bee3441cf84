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
        """One-time npz -> txt conversion with the reference's key names
        'camera_pose' / 'camera_intrinsics' (co3d.py:131-146)."""
        pose_file = npz_path.replace(".npz", "_pose.txt")
        K_file = npz_path.replace(".npz", "_intrinsic.txt")
        if os.path.exists(pose_file) and os.path.exists(K_file):
            return pose_file, K_file
        data = np.load(npz_path)
        pose = data.get("camera_pose")
        K = data.get("camera_intrinsics")
        if pose is None or K is None:
            return None, None
        np.savetxt(pose_file, np.asarray(pose).reshape(4, 4))
        np.savetxt(K_file, np.asarray(K).reshape(3, 3))
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
                # The metadata maps seq -> SELECTED frame indices
                # (co3d.py:171-186 builds frameNNNNNN paths from them); a
                # plain list of seqs (fallback layout) globs everything.
                frames = seqs[seq] if isinstance(seqs, dict) else None
                if frames is not None:
                    imgs = [
                        os.path.join(img_dir, f"frame{int(f):06d}.jpg")
                        for f in frames
                    ]
                else:
                    imgs = sorted(glob.glob(os.path.join(img_dir, "frame*.jpg")))
                poses, Ks, keep, masks = [], [], [], []
                for img in imgs:
                    stem = os.path.splitext(img)[0]
                    if os.path.exists(stem + "_pose.txt"):
                        p, k = stem + "_pose.txt", stem + "_intrinsic.txt"
                    elif os.path.exists(stem + ".npz"):
                        p, k = self._convert_npz(stem + ".npz")
                    else:
                        continue
                    if p is None:
                        continue
                    poses.append(p)
                    Ks.append(k)
                    keep.append(img)
                    # Boxes come from the mask images (co3d.py:181-229
                    # "boxes": selected_masks).
                    mask = os.path.join(
                        seq_dir,
                        "masks",
                        os.path.basename(stem) + ".png",
                    )
                    masks.append(mask if os.path.exists(mask) else None)
                if not keep:
                    continue
                self.images[split][key] = keep
                self.poses[split][key] = poses
                self.intrinsics[split][key] = Ks
                self.boxes[split][key] = masks
                self.cat_len[split][key] = len(keep)
                ply = os.path.join(raw_root, cat, seq, "pointcloud.ply")
                if os.path.exists(ply):
                    self.model_paths[key] = ply
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = getattr(self, table)[split]

    def read_box(self, path: str, split=None):
        """Mask-png boxes via the reference's extract_bboxes semantics
        (bbox_utils.py:13-34): cv2.boundingRect -> [x, y, x+w, y+h], i.e.
        EXCLUSIVE max (unlike MOPED's inclusive variant)."""
        if path is None or not path.endswith(".png"):
            return super().read_box(path, split)
        from PIL import Image

        mask = np.asarray(Image.open(path).convert("L"))
        ys, xs = np.nonzero(mask > 0)
        if len(xs) == 0:
            return None
        return np.array(
            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], dtype=np.int64
        )

    def read_pose(self, path: str) -> np.ndarray:
        # CO3D stores cam2world; the pipeline wants world2cam
        # (reference base.py:414-416).
        pose = super().read_pose(path)
        return np.linalg.inv(pose)

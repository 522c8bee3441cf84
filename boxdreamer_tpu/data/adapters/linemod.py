"""LINEMOD / LINEMOD-Occlusion adapters.

File-layout contract matches the reference's OnePose++-preprocessed LINEMOD
(src/datasets/linemod.py:42-293, src/datasets/linemodo.py:42-284): the root
contains ``real_train{reference_suffix}/<cat>/`` and ``real_test/<cat>/``
directories with per-frame files

    <id>-color.png, <id>-box.txt (train) / <id>-box_fasterrcnn.txt (test),
    <id>-pose.txt, <id>-intrisic.txt   [sic — the reference's spelling]

plus ``models{model_suffix}/<cat>/<cat>.ply`` CAD models. The training split
doubles as the reference database (images['ref'] = images['train']).
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import numpy as np

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig

DEFAULT_INTRINSICS = (572.4114, 573.57043, 325.2611, 242.04899)


class LINEMODDataset(BaseDataset):
    dataset = "linemod"
    test_dirname = "real_test"  # LMO overrides: "test-preprocessed"

    def __init__(
        self,
        config: DatasetConfig,
        split: str,
        root: str,
        model_suffix: str = "",
        reference_suffix: str = "",
        cat_filter: Optional[Sequence[str]] = None,
    ):
        super().__init__(config, split)
        self.root = root
        self.model_root = os.path.join(root, "models" + (model_suffix or ""))
        self.train_root = os.path.join(root, "real_train" + (reference_suffix or ""))
        self.test_root = os.path.join(root, self.test_dirname)
        self.cat_filter = cat_filter
        self.load_data()

    # ------------------------------------------------------------------ load

    def load_data(self):
        self._load_split("train")
        if self.split in ("val", "test"):
            self._load_split(self.split)
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = getattr(self, table)["train"]
        self._load_models()

    def _box_pattern(self, split: str) -> str:
        return "-box.txt" if split == "train" else "-box_fasterrcnn.txt"

    def _load_split(self, split: str):
        root = self.train_root if split == "train" else self.test_root
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        cats = sorted(
            c for c in os.listdir(root) if os.path.isdir(os.path.join(root, c))
        )
        if self.cat_filter:
            cats = [c for c in cats if c in self.cat_filter]
        for cat in cats:
            cat_dir = os.path.join(root, cat)
            imgs = sorted(glob.glob(os.path.join(cat_dir, "*-color.png")))
            boxes = sorted(
                glob.glob(os.path.join(cat_dir, f"*{self._box_pattern(split)}"))
            )
            poses = sorted(glob.glob(os.path.join(cat_dir, "*-pose.txt")))
            Ks = sorted(glob.glob(os.path.join(cat_dir, "*-intrisic.txt")))
            if not Ks:
                Ks = self._write_default_intrinsics(cat_dir, imgs)
            n = len(imgs)
            assert len(boxes) == len(poses) == len(Ks) == n, (
                f"inconsistent file counts for {cat}: {n} images, "
                f"{len(boxes)} boxes, {len(poses)} poses, {len(Ks)} intrinsics"
            )
            self.images[split][cat] = imgs
            self.boxes[split][cat] = boxes
            self.poses[split][cat] = poses
            self.intrinsics[split][cat] = Ks
            self.cat_len[split][cat] = n

    def _write_default_intrinsics(self, cat_dir: str, image_files):
        fx, fy, cx, cy = DEFAULT_INTRINSICS
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        out = []
        for img in image_files:
            base = os.path.basename(img).split("-")[0]
            path = os.path.join(cat_dir, f"{base}-intrisic.txt")
            if not os.path.exists(path):
                np.savetxt(path, K)
            out.append(path)
        return sorted(out)

    def read_box(self, path: str, split=None):
        """Train/ref ``-box.txt`` files store [x, y, w, h]; test
        ``-box_fasterrcnn.txt`` stores [x1, y1, x2, y2] (reference
        linemod.py:268-293). Found by the end-to-end dataset golden test —
        reading both as xyxy silently shrank every reference crop."""
        box = super().read_box(path, split)
        if box is not None and split in ("ref", "train"):
            box = np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]])
        return box

    def _load_models(self):
        if not os.path.isdir(self.model_root):
            return
        for cat in sorted(os.listdir(self.model_root)):
            d = os.path.join(self.model_root, cat)
            if not os.path.isdir(d):
                continue
            candidates = sorted(glob.glob(os.path.join(d, "*.ply")))
            if candidates:
                self.model_paths[cat] = candidates[0]


class LINEMODOccludedDataset(LINEMODDataset):
    """LINEMOD-Occlusion: same layout, occlusion test split
    (reference src/datasets/linemodo.py)."""

    dataset = "linemodo"
    # Reference linemodo.py:93 reads the occlusion test split from the
    # BOP-scene-derived "test-preprocessed" tree (tools/bop_convert.py's
    # convert_lmo output), with "-box.txt" files in every split (:158).
    test_dirname = "test-preprocessed"

    def _box_pattern(self, split: str) -> str:
        return "-box.txt"

    def read_box(self, path: str, split=None):
        """LMO boxes are [x, y, w, h] in EVERY split (reference
        linemodo.py:282 converts unconditionally; the preprocessed LMO
        test boxes come from BOP bbox_obj, which is xywh)."""
        box = BaseDataset.read_box(self, path, split)
        if box is not None:
            box = np.array([box[0], box[1], box[0] + box[2], box[1] + box[3]])
        return box

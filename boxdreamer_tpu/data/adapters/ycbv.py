"""YCB-Video adapter.

Layout contract (reference src/datasets/ycbv.py:41-341): the root holds
``train{reference_suffix}/``, ``test/``, ``val/`` with either flat category
dirs or ``<obj>/<seq>/`` nesting, each containing per-frame files

    <id>-color.png, <id>-box.txt, <id>-pose.txt, <id>-intrinsics.txt

and ``models{model_suffix}/`` CAD models. ``ref_mode='random_seq'`` (the
reference default) shuffles the train reference DB once at load;
``'same_seq'`` uses the eval split itself as references (FoundationPose-
style reference protocol).
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import numpy as np

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


class YCBVDataset(BaseDataset):
    dataset = "ycbv"

    def __init__(
        self,
        config: DatasetConfig,
        split: str,
        root: str,
        model_suffix: str = "",
        reference_suffix: str = "",
        ref_mode: str = "random_seq",
        cat_filter: Optional[Sequence[str]] = None,
    ):
        super().__init__(config, split)
        self.root = root
        self.model_root = os.path.join(root, "models" + (model_suffix or ""))
        self.train_root = os.path.join(root, "train" + (reference_suffix or ""))
        self.test_root = os.path.join(root, "test")
        self.val_root = os.path.join(root, "val")
        self.ref_mode = ref_mode
        self.cat_filter = cat_filter
        self.load_data()

    def load_data(self):
        self._load_split("train")
        if self.split in ("val", "test"):
            self._load_split(self.split)
        src = "train" if self.ref_mode == "random_seq" else self.split
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = {
                k: (list(v) if isinstance(v, list) else v)
                for k, v in getattr(self, table)[src].items()
            }
        if self.ref_mode == "random_seq":
            for cat in self.images["ref"]:
                idx = self._rng.permutation(len(self.images["ref"][cat]))
                for table in ("images", "boxes", "poses", "intrinsics"):
                    vals = getattr(self, table)["ref"][cat]
                    getattr(self, table)["ref"][cat] = [vals[i] for i in idx]
        self._load_models()

    def _category_dirs(self, root: str):
        """Yield (obj_key, frame_dir) handling flat or obj/seq nesting.
        The reference MERGES all sequences of an object under the bare obj
        key (ycbv.py:234 ``cat.split('/')[0]`` + the concat at :252-260);
        its concat order is thread-completion order — we use sorted seq
        order, the deterministic refinement."""
        for entry in sorted(os.listdir(root)):
            d = os.path.join(root, entry)
            if not os.path.isdir(d):
                continue
            if glob.glob(os.path.join(d, "*-color.png")):
                yield entry, d
            else:
                for seq in sorted(os.listdir(d)):
                    sd = os.path.join(d, seq)
                    if os.path.isdir(sd):
                        yield entry, sd

    def _load_split(self, split: str):
        root = {"train": self.train_root, "test": self.test_root, "val": self.val_root}[
            split
        ]
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        for cat, d in self._category_dirs(root):
            if self.cat_filter and cat.split("_")[0] not in self.cat_filter:
                continue
            imgs = sorted(glob.glob(os.path.join(d, "*-color.png")))
            boxes = sorted(glob.glob(os.path.join(d, "*-box.txt")))
            poses = sorted(glob.glob(os.path.join(d, "*-pose.txt")))
            Ks = sorted(glob.glob(os.path.join(d, "*-intrinsics.txt")))
            if not imgs or not (len(imgs) == len(boxes) == len(poses) == len(Ks)):
                continue
            # Sequences of one object accumulate under the obj key.
            self.images[split].setdefault(cat, []).extend(imgs)
            self.boxes[split].setdefault(cat, []).extend(boxes)
            self.poses[split].setdefault(cat, []).extend(poses)
            self.intrinsics[split].setdefault(cat, []).extend(Ks)
            self.cat_len[split][cat] = len(self.images[split][cat])

    def _load_models(self):
        if not os.path.isdir(self.model_root):
            return
        for entry in sorted(os.listdir(self.model_root)):
            d = os.path.join(self.model_root, entry)
            if os.path.isdir(d):
                # The reference looks ONLY for models/<obj>/points.xyz
                # (ycbv.py:300-314); keep .ply as a convenience fallback.
                xyz = os.path.join(d, "points.xyz")
                if os.path.exists(xyz):
                    self.model_paths[entry] = xyz
                    continue
                plys = sorted(glob.glob(os.path.join(d, "*.ply")))
                if plys:
                    self.model_paths[entry] = plys[0]
            elif entry.endswith(".ply"):
                self.model_paths[os.path.splitext(entry)[0]] = d

    def get_model_path(self, cat: str):
        return self.model_paths.get(cat) or self.model_paths.get(cat.split("_")[0])

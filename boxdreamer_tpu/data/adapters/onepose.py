"""OnePose / OnePose-LowTexture adapter.

Layout contract (reference src/datasets/onepose.py:30-459): the root holds
``train_data/``, ``val_data/``, ``test_data{reference_suffix}/``, each with
``<obj>/<obj>-<seq>/`` sequence dirs containing

    color/<n>.png, poses_ba/<n>.txt, intrin_ba/<n>.txt

plus a per-object ``<obj>/box3d_corners.txt`` 3D box. Category keys are
``<obj>_<seq>``; with ``ref_mode='first_seq'`` (the default) sequence 1 of
each object becomes the reference DB and the remaining sequences merge into
one per-object eval split.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional

import numpy as np

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


def _numeric_sort(files):
    def key(f):
        m = re.search(r"(\d+)", os.path.basename(f))
        return int(m.group(1)) if m else 1 << 30

    return sorted(files, key=key)


class OnePoseDataset(BaseDataset):
    dataset = "onepose"

    def __init__(
        self,
        config: DatasetConfig,
        split: str,
        root: str,
        model_suffix: str = "",
        reference_suffix: str = "",
        ref_mode: str = "first_seq",  # 'first_seq' | 'same_seq'
    ):
        super().__init__(config, split)
        self.root = root
        self.train_root = os.path.join(root, "train_data")
        self.val_root = os.path.join(root, "val_data")
        self.test_root = os.path.join(root, "test_data" + (reference_suffix or ""))
        self.model_root = os.path.join(root, "models" + (model_suffix or ""))
        self.ref_mode = ref_mode
        self.load_data()

    def load_data(self):
        root = {
            "train": self.train_root,
            "val": self.val_root,
            "test": self.test_root,
        }[self.split]
        split = self.split
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        self.bbox_3d_paths.setdefault(split, {})

        # Auto-attach a packed image store at the split root when one exists:
        # a framework data.boxpack or a reference-produced data.lmdb
        # (reference onepose.py:217-229 opens data.lmdb the same way).
        try:
            from boxdreamer_tpu.data.lmdb_reader import open_image_store

            store = open_image_store(root)
            if store is not None:
                self.attach_pack(store, root)
        except Exception as e:  # noqa: BLE001 — mirror the reference's
            # "log and fall back to the filesystem" behavior (onepose.py:228)
            from boxdreamer_tpu.utils.log import ERROR

            ERROR(f"failed to open packed image store under {root}: {e}")

        for obj in sorted(os.listdir(root)):
            obj_dir = os.path.join(root, obj)
            if not os.path.isdir(obj_dir):
                continue
            box3d = os.path.join(obj_dir, "box3d_corners.txt")
            for seq_dir_name in sorted(os.listdir(obj_dir)):
                seq_dir = os.path.join(obj_dir, seq_dir_name)
                color = os.path.join(seq_dir, "color")
                if not os.path.isdir(color):
                    continue
                seq = seq_dir_name.split("-")[-1]
                # Reference cat key: f"{obj.split('-')[0]}_{seq.split('-')[-1]}"
                # (onepose.py:294) — the object part drops everything after
                # the first dash (OnePose dirs are like "0408-colorbox").
                cat = f"{obj.split('-')[0]}_{seq}"
                imgs = _numeric_sort(glob.glob(os.path.join(color, "*.png")))
                poses = _numeric_sort(
                    glob.glob(os.path.join(seq_dir, "poses_ba", "*.txt"))
                )
                Ks = _numeric_sort(
                    glob.glob(os.path.join(seq_dir, "intrin_ba", "*.txt"))
                )
                n = min(len(imgs), len(poses), len(Ks))
                if n == 0:
                    continue
                self.images[split][cat] = imgs[:n]
                self.poses[split][cat] = poses[:n]
                self.intrinsics[split][cat] = Ks[:n]
                self.boxes[split][cat] = [None] * n
                self.cat_len[split][cat] = n
                if os.path.exists(box3d):
                    self.bbox_3d_paths[split][cat] = box3d

        if self.ref_mode == "same_seq":
            for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
                getattr(self, table)["ref"] = dict(getattr(self, table)[split])
            self.bbox_3d_paths["ref"] = dict(self.bbox_3d_paths[split])
            return

        # first_seq: seq "1" of each object -> reference DB; merge the rest
        # per object (reference onepose.py:96-199).
        merged = {t: {} for t in ("images", "boxes", "poses", "intrinsics", "cat_len")}
        ref = {t: {} for t in ("images", "boxes", "poses", "intrinsics", "cat_len")}
        ref_box3d, merged_box3d = {}, {}
        for cat in list(self.images[split].keys()):
            obj, seq = cat.rsplit("_", 1)
            target = ref if seq == "1" else merged
            for t in ("images", "boxes", "poses", "intrinsics"):
                target[t].setdefault(obj, []).extend(getattr(self, t)[split][cat])
            target["cat_len"][obj] = target["cat_len"].get(obj, 0) + self.cat_len[
                split
            ][cat]
            box = self.bbox_3d_paths[split].get(cat)
            if box:
                (ref_box3d if seq == "1" else merged_box3d)[obj] = box
        # Objects with no non-reference sequence fall back to the ref seq.
        for obj in list(ref["cat_len"].keys()):
            if obj not in merged["cat_len"]:
                for t in ("images", "boxes", "poses", "intrinsics", "cat_len"):
                    merged[t][obj] = ref[t][obj]
                if obj in ref_box3d:
                    merged_box3d[obj] = ref_box3d[obj]
        for t in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, t)[split] = merged[t]
            getattr(self, t)["ref"] = ref[t]
        self.bbox_3d_paths[split] = {**ref_box3d, **merged_box3d}
        self.bbox_3d_paths["ref"] = ref_box3d

"""Objaverse synthetic-render adapter.

The reference trains on Blender-rendered Objaverse views
(src/datasets/objaverse.py:28-539 + the renderer
src/datasets/utils/objaverse_utils/scripts/rendering.py). Two on-disk
layouts are supported:

  * the REFERENCE layout (objaverse.py:300-360):
    ``objaverse_render/_v0/<shard>/<obj>/<render_type>/renderings/*.png``
    (RGBA; 2D boxes come from the alpha channel) with one ``meta .json``
    per render dir holding ``frames[i].w2c`` poses and per-frame
    fx/fy/cx/cy intrinsics, categories keyed ``<obj>_<render_type>``,
    ``bbox_3d/<obj>.txt`` corner files, glb models under
    ``Objaverse/Objaverse_glbs/<shard>/``, and the SUN2012 background
    pool;
  * a flat txt layout (this repo's tools/objaverse_render.py driver):
    ``<shard>/<obj>/<render_type>/ with color/<n>.png, pose/<n>.txt,
    intrinsics/<n>.txt``.

Pose/intrinsic entries in the reference layout are stored as
``<meta.json>#<frame_index>`` pseudo-paths so the base class's
one-path-per-frame contract holds.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional

import numpy as np
from PIL import Image

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig

RENDER_TYPES = ("uniform", "uniform_z", "random", "random_fix")


class ObjaverseDataset(BaseDataset):
    dataset = "objaverse"

    def __init__(
        self,
        config: DatasetConfig,
        split: str,
        root: str,
        render_subdir: str = "objaverse_render/_v0",
        render_type: str = "random",
        subdir_num: Optional[int] = None,
    ):
        super().__init__(config, split)
        self.root = root
        self.render_root = os.path.join(root, render_subdir)
        self.model_root = os.path.join(root, "Objaverse", "Objaverse_glbs")
        self.bbox3d_root = os.path.join(root, "bbox_3d")
        self.bg_root = os.path.join(root, "SUN2012pascalformat")
        self.render_type = render_type
        self.subdir_num = subdir_num
        self._meta_cache: dict = {}
        self.load_data()

    # ------------------------------------------------------------- loading

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

    def _load_reference_layout(self, split: str) -> bool:
        """Reference render tree: <shard>/<obj>/<render_type>/renderings.
        Returns True if anything was found."""
        found = False
        shards = sorted(
            d
            for d in os.listdir(self.render_root)
            if os.path.isdir(os.path.join(self.render_root, d))
        )
        if self.subdir_num is not None:
            shards = shards[: self.subdir_num]
        for shard in shards:
            shard_dir = os.path.join(self.render_root, shard)
            for obj in sorted(os.listdir(shard_dir)):
                for rt in RENDER_TYPES:
                    rt_dir = os.path.join(shard_dir, obj, rt)
                    render_dir = os.path.join(rt_dir, "renderings")
                    if not os.path.isdir(render_dir):
                        continue
                    imgs = sorted(glob.glob(os.path.join(render_dir, "*.png")))
                    metas = sorted(glob.glob(os.path.join(rt_dir, "*.json")))
                    box3d = os.path.join(self.bbox3d_root, f"{obj}.txt")
                    # The reference skips render types without images, a
                    # meta json, or the bbox_3d file (objaverse.py:322-338).
                    if not imgs or not metas or not os.path.exists(box3d):
                        continue
                    meta = metas[0]
                    cat = f"{obj}_{rt}"
                    self.images[split][cat] = imgs
                    # frame i of the sorted renderings pairs with
                    # meta["frames"][i] (reference read_poses indexes the
                    # shared json by sequence position).
                    self.poses[split][cat] = [
                        f"{meta}#{i}" for i in range(len(imgs))
                    ]
                    self.intrinsics[split][cat] = [
                        f"{meta}#{i}" for i in range(len(imgs))
                    ]
                    self.boxes[split][cat] = list(imgs)  # alpha-mask boxes
                    self.cat_len[split][cat] = len(imgs)
                    self.bbox_3d_paths[split][cat] = box3d
                    glb = os.path.join(self.model_root, shard, obj + ".glb")
                    if os.path.exists(glb):
                        self.model_paths[cat] = glb
                    found = True
        return found

    def _load_flat_layout(self, split: str):
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

    def load_data(self):
        split = self.split
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table).setdefault(split, {})
        self.bbox_3d_paths.setdefault(split, {})
        if not os.path.isdir(self.render_root):
            return
        if not self._load_reference_layout(split):
            self._load_flat_layout(split)
        for table in ("images", "boxes", "poses", "intrinsics", "cat_len"):
            getattr(self, table)["ref"] = getattr(self, table)[split]
        self.bbox_3d_paths["ref"] = self.bbox_3d_paths[split]
        if split == "train":
            # SUN2012 background replacement pool for augmentation
            # (reference objaverse.py:438-460 + aug add_background).
            self.bg_image_paths = self.background_images()

    # ------------------------------------------------------------- readers

    def _meta_frame(self, pseudo_path: str):
        path, _, idx = pseudo_path.rpartition("#")
        if path not in self._meta_cache:
            with open(path) as f:
                self._meta_cache[path] = json.load(f)
        return self._meta_cache[path]["frames"][int(idx)]

    def read_pose(self, path: str) -> np.ndarray:
        if "#" in path:
            return np.asarray(self._meta_frame(path)["w2c"], dtype=np.float64)
        return super().read_pose(path)

    def read_intrinsics(self, path: str) -> np.ndarray:
        if "#" in path:
            fr = self._meta_frame(path)
            return np.array(
                [
                    [fr["fx"], 0.0, fr["cx"]],
                    [0.0, fr["fy"], fr["cy"]],
                    [0.0, 0.0, 1.0],
                ]
            )
        return super().read_intrinsics(path)

    def read_box(self, path: str, split=None):
        """Alpha-channel bounding box, INCLUSIVE max indices (reference
        objaverse.py read_boxes:451-481 — [cmin, rmin, cmax, rmax])."""
        if path is None or not path.endswith(".png"):
            return super().read_box(path, split)
        rgba = np.asarray(Image.open(path))
        if rgba.ndim != 3 or rgba.shape[2] < 4:
            return None
        mask = rgba[:, :, 3] > 0
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return None
        return np.array([xs.min(), ys.min(), xs.max(), ys.max()], dtype=np.int64)

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

"""Base dataset: the preprocessing heart of the data layer.

Host-side equivalent of the reference BoxDreamerBaseDataset
(src/datasets/base.py:47-988): per sample it picks a query frame + N
reference frames, decodes images, projects the object's 3D box to refine the
2D crop box, square-crops + resizes, adjusts intrinsics (pixel and NDC),
normalizes cameras per the coordinate mode, generates bbox feature maps, and
returns a ~20-key numpy batch dict with the same key names as the reference
(base.py:725-767) so downstream code (model, loss, metrics) is drop-in.

Adapters (data/adapters/) populate the path dictionaries
``images/boxes/poses/intrinsics[split][category] -> [file, ...]`` and
``model_paths[category]``; everything else lives here.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from boxdreamer_tpu.data import preprocess as pp
from boxdreamer_tpu.data import sampling
from boxdreamer_tpu.data.ply import get_all_points_on_model


@dataclasses.dataclass
class DatasetConfig:
    """Mirrors the reference's datamodule base anchor
    (configs/datamodule/local.yaml:12-39)."""

    image_size: int = 224
    length: int = 6  # N references + 1 query
    stride: int = 1
    dynamic_length: Optional[Tuple[int, int]] = None  # (min, max) total length
    sampling_strategy: str = "uniform"  # 'uniform' | 'random' | 'stride'
    dynamic_stride: bool = False
    min_stride: int = 1
    max_stride: int = 1
    coordinate: str = "object"  # 'object' | 'first_camera'
    pose_representation: str = "bb8"
    bbox_representation: str = "heatmap"
    compute_optical: bool = False
    normalize_trans: bool = False
    max_norm: bool = False
    use_bbox: bool = True
    use_mask: bool = False
    mask_bg: bool = True
    precision: str = "float32"  # dtype of returned arrays
    seed: Optional[int] = None
    # When True, skip host-side bbox feature-map generation and ship only
    # the (T, 8, 2) pixel projections ('bbox_proj_pix'); the train/eval
    # steps generate the maps on device (ops/heatmap.py) — 75000x less
    # loader output per frame and ~14 ms/sample host work removed.
    device_bbox_feat: bool = False
    # Training-time augmentation (reference aug.py wiring in base.py:418-533):
    augmentation: Optional[object] = None  # AugmentationConfig
    pose_augmentation: bool = False
    ref_aug: bool = False  # also augment reference frames, not just the query


def _load_txt_matrix(path: str, shape: Tuple[int, ...]) -> np.ndarray:
    arr = np.loadtxt(path).astype(np.float64)
    return arr.reshape(shape)


class BaseDataset:
    """Dict-of-splits dataset; adapters fill the path tables in load_data()."""

    dataset: str = "base"

    def __init__(self, config: DatasetConfig, split: str):
        self.config = config
        self.split = split
        self.image_size = config.image_size
        # path tables: [split][category] -> list of file paths
        self.images: Dict[str, Dict[str, List[str]]] = {}
        self.boxes: Dict[str, Dict[str, List[str]]] = {}
        self.poses: Dict[str, Dict[str, List[str]]] = {}
        self.intrinsics: Dict[str, Dict[str, List[str]]] = {}
        self.cat_len: Dict[str, Dict[str, int]] = {}
        self.model_paths: Dict[str, str] = {}
        self.bbox_3d_paths: Dict[str, Dict[str, str]] = {}  # [split][cat] -> txt
        self._rng = np.random.default_rng(config.seed)
        self.augmentor = None
        if config.augmentation is not None:
            from boxdreamer_tpu.data.augment import AugmentationProcessor

            self.augmentor = AugmentationProcessor(config.augmentation)
        self.bg_image_paths: List[str] = []  # background pool for synthetic data

    # ---------------------------------------------------------------- lookup

    def __len__(self) -> int:
        return sum(self.cat_len.get(self.split, {}).values())

    def _get_category(self, idx: int) -> Tuple[str, int]:
        """(category, index within category) for a flat index
        (reference base.py:769-787)."""
        cats = list(self.cat_len[self.split].keys())
        counts = np.cumsum([self.cat_len[self.split][c] for c in cats])
        cat_idx = int(np.searchsorted(counts, idx, side="right"))
        category = cats[cat_idx]
        within = idx if cat_idx == 0 else idx - counts[cat_idx - 1]
        return category, int(within)

    # ------------------------------------------------------------------- io

    def attach_pack(self, pack, root: str) -> None:
        """Serve image reads from a boxpack store keyed by path relative to
        ``root`` (the LMDB-equivalent fast path; reference base.py:174-217).
        Falls through to the filesystem for keys missing from the pack."""
        self._pack = pack
        self._pack_root = root

    def read_image(self, path: str) -> Image.Image:
        pack = getattr(self, "_pack", None)
        if pack is not None:
            import io as _io

            rel = os.path.relpath(path, self._pack_root)
            blob = pack.get(rel)
            if blob is None:
                # Reference-produced LMDB dumps key records by ABSOLUTE path
                # (lmdb_dump.py: str(Path(file).absolute())).
                blob = pack.get(path)
            if blob is not None:
                return Image.open(_io.BytesIO(blob)).convert("RGB")
        return Image.open(path).convert("RGB")

    def read_pose(self, path: str) -> np.ndarray:
        arr = np.loadtxt(path).astype(np.float64)
        if arr.shape == (3, 4):
            arr = np.concatenate([arr, [[0, 0, 0, 1.0]]], axis=0)
        return arr.reshape(4, 4)

    def read_intrinsics(self, path: str) -> np.ndarray:
        return _load_txt_matrix(path, (3, 3))

    def read_box(self, path: str, split: Optional[str] = None) -> Optional[np.ndarray]:
        """Read a 2D box as [x1, y1, x2, y2]. ``split`` lets adapters apply
        split-dependent storage conventions (the reference's LINEMOD stores
        train/ref boxes as [x, y, w, h] but test boxes as xyxy —
        linemod.py:268-293)."""
        arr = np.loadtxt(path).astype(np.float64).reshape(-1)
        return arr[:4] if arr.size >= 4 else None

    def get_model_path(self, cat: str) -> Optional[str]:
        return self.model_paths.get(cat)

    def get_bbox3d(self, cat: str) -> Optional[np.ndarray]:
        """3D box corners for the category: from a precomputed txt or the CAD
        point cloud (reference prepare_bbox3d, bbox_utils.py:94-162)."""
        table = self.bbox_3d_paths.get(self.split)
        if table and cat in table:
            return np.loadtxt(table[cat]).reshape(8, 3)
        path = self.get_model_path(cat)
        if path is None:
            return None
        pts = get_all_points_on_model(path)
        # Always axis-aligned: prepare_bbox3d HAS a PCA branch for
        # co3d/moped (bbox_utils.py:139-160), but the pipeline's only call
        # site passes no ``dataset`` argument (base.py:436), so that branch
        # is dead in the reference's data path — pp.pca_bbox_corners
        # implements it for API parity.
        return pp.bbox_corners_from_points(pts)

    # --------------------------------------------------------------- getitem

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        # Error-retry: any failure loads the next index instead
        # (reference base.py:969-979).
        for attempt in range(8):
            try:
                return self.get_item(
                    (idx + attempt) % max(len(self), 1)
                )
            except Exception:  # noqa: BLE001
                if attempt == 7:
                    raise
        raise RuntimeError("unreachable")

    def get_item(
        self, idx: int, n_total: Optional[int] = None
    ) -> Dict[str, np.ndarray]:
        """``n_total`` overrides the sequence length for this sample — used
        by the dynamic-length batch sampler so every sample in a batch shares
        one length (reference DynamicBatchSampler contract)."""
        cat, q_idx = self._get_category(idx)
        cfg = self.config

        if n_total is None:
            n_total = cfg.length
            if cfg.dynamic_length is not None:
                lo, hi = cfg.dynamic_length
                n_total = int(self._rng.integers(lo, hi + 1))
        n_refs = n_total - 1

        ref_db_len = self.cat_len["ref"][cat]
        ref_idxs = sampling.select_ref_indices(
            ref_length=n_refs,
            max_ref_idx=ref_db_len - 1,
            strategy=cfg.sampling_strategy,
            stride=cfg.stride,
            dynamic_stride=cfg.dynamic_stride,
            min_stride=cfg.min_stride,
            max_stride=cfg.max_stride,
            query_idx=q_idx,
            anchor_to_query=self.dataset not in ("linemod", "linemodo"),
            rng=self._rng,
        )

        # Except for the LINEMOD-family/onepose datasets (whose ref DB is a
        # separate split), the query frame must not appear among its own
        # references — drop it and backfill with random distinct indices
        # (reference base.py:863-874).
        if (
            q_idx in ref_idxs
            and self.dataset not in ("linemod", "ycbv", "linemodo", "onepose")
        ):
            ref_idxs = ref_idxs[ref_idxs != q_idx]
            if ref_db_len - 1 < n_refs:
                # Not enough distinct non-query frames to backfill from — an
                # unbounded rejection loop here would hang the worker where
                # __getitem__'s retry-on-exception cannot reach. Raise so the
                # retry path skips to the next index instead.
                raise ValueError(
                    f"sequence {cat!r} has only {ref_db_len} frames; cannot "
                    f"draw {n_refs} references distinct from the query"
                )
            while len(ref_idxs) < n_refs:
                new_idx = int(self._rng.integers(0, ref_db_len))
                if new_idx != q_idx and new_idx not in ref_idxs:
                    ref_idxs = np.append(ref_idxs, new_idx)

        image_paths = [self.images["ref"][cat][i] for i in ref_idxs] + [
            self.images[self.split][cat][q_idx]
        ]
        pose_paths = [self.poses["ref"][cat][i] for i in ref_idxs] + [
            self.poses[self.split][cat][q_idx]
        ]
        K_paths = [self.intrinsics["ref"][cat][i] for i in ref_idxs] + [
            self.intrinsics[self.split][cat][q_idx]
        ]
        box_paths = [self.boxes["ref"][cat][i] for i in ref_idxs] + [
            self.boxes[self.split][cat][q_idx]
        ]

        images = [self.read_image(p) for p in image_paths]
        poses = np.stack([self.read_pose(p) for p in pose_paths])
        intrinsics = np.stack([self.read_intrinsics(p) for p in K_paths])
        box_splits = ["ref"] * len(ref_idxs) + [self.split]
        boxes = [
            self.read_box(p, s) if p is not None else None
            for p, s in zip(box_paths, box_splits)
        ]
        query_idx = n_total - 1  # query is the last frame

        return self.process_sequence(
            images, image_paths, boxes, poses, intrinsics, cat, query_idx
        )

    # --------------------------------------------------------------- process

    def process_sequence(
        self,
        images: Sequence[Image.Image],
        image_paths: Sequence[str],
        boxes: Sequence[Optional[np.ndarray]],
        poses: np.ndarray,
        intrinsics: np.ndarray,
        cat: str,
        query_idx: int,
    ) -> Dict[str, np.ndarray]:
        """The preprocessing chain (reference process_data, base.py:376-767)."""
        cfg = self.config
        S = self.image_size
        T = len(images)
        dtype = np.dtype(cfg.precision)

        bbox3d = self.get_bbox3d(cat)
        # The reference stacks all per-frame boxes into ONE ndarray
        # (base.py:917 np.array(ref_boxes + query_box)); when every adapter
        # box is integer-typed (e.g. MOPED's mask-derived boxes), assigning
        # the float projected-box replacement into that array TRUNCATES to
        # int (base.py:474) — replicate that dtype-dependent contract.
        int_boxes = all(b is not None for b in boxes) and np.asarray(
            boxes
        ).dtype.kind in "iu"

        def _as_stored(box):
            # Keep the integer dtype: square_bbox/downstream then inherit
            # the reference's int-truncation semantics.
            return box.astype(np.int64) if int_boxes else box

        # The reference rounds box corners through float32 before every
        # projection (torch.from_numpy(bbox3d).float(), base.py:437 +
        # reproj_pytorch's .float() casts) — the crop geometry inherits the
        # f32 rounding, so replicate it exactly.
        bbox3d32 = None if bbox3d is None else bbox3d.astype(np.float32)

        is_train = self.split == "train" and self.augmentor is not None
        if is_train and cfg.pose_augmentation:
            # Random object-frame rotation; applied before the "original"
            # snapshot, as in the reference (base.py:418-420).
            poses = self.augmentor.pose_augmentation_R(poses)

        original_intrinsics = intrinsics.copy()
        original_poses = poses.copy()

        imgs_out, masks_out, crops_out, K_crop_out = [], [], [], []
        shapes = []
        bg_pool = self.bg_image_paths if is_train else []
        for i in range(T):
            img = images[i]
            K = intrinsics[i].copy()

            if is_train:
                # In-plane rotation aug updates img/pose/box/K consistently
                # (reference base.py:444-453).
                img, poses[i], boxes[i], K = self.augmentor.rotate_image(
                    img, poses[i], boxes[i], K
                )
                intrinsics[i] = K
                original_intrinsics[i] = K
                original_poses[i] = poses[i]
                img = self.augmentor.apply_rgb_augmentation(img)
            shapes.append(img.size)

            org_box = boxes[i]
            box = org_box
            if bbox3d is not None:
                # Replace the detection box by the projected-3D-box enclosure
                # (base.py:455-474), in f32 like the reference.
                proj = pp.project_points_f32(K, poses[i], bbox3d32)
                box = _as_stored(pp.bbox_from_projection(proj))

            if box is not None:
                dx, dy = box[2] - box[0], box[3] - box[1]
                if dx > img.width * 2 and dy > img.height * 2:
                    box = np.array([0, 0, img.width, img.height], dtype=np.float64)
                img, padding = pp.pad_image_for_bbox(img, box)
                if padding:
                    K = pp.adjust_intrinsics_for_padding(K, padding)
                    original_intrinsics[i] = K
                    if bbox3d is not None:
                        proj = pp.project_points_f32(K, poses[i], bbox3d32)
                        box = _as_stored(pp.bbox_from_projection(proj))

            if is_train and (i == query_idx or cfg.ref_aug):
                # Occlusion-style augs on the query frame only by default
                # (reference base.py:503-533).
                if bg_pool:
                    from PIL import Image as _PILImage

                    bg = _PILImage.open(
                        bg_pool[int(self._rng.integers(0, len(bg_pool)))]
                    ).convert("RGB")
                    img = self.augmentor.add_background(img, bg)
                if box is not None:
                    img = self.augmentor.random_truncate_image_with_bbox(img, box)
                    img = self.augmentor.random_mask_image_with_bbox(img, None, box)

            arr, mask_arr, crop_params, crop_box = pp.pad_and_resize_image(
                img,
                S,
                bbox_anno=pp.square_bbox(box) if cfg.use_bbox and box is not None else None,
                # use_mask multiplies the crop by a bbox-rectangle mask
                # (reference base.py:455 make_mask_by_bbox + pad_and_resize).
                mask=pp.make_mask_by_bbox(box, img.size) if cfg.use_mask else None,
                bbox_obj=org_box if (cfg.use_bbox and cfg.mask_bg) else None,
            )
            K_crop = pp.adjust_intrinsics_for_crop_resize(K, crop_box, S)

            imgs_out.append(arr)
            masks_out.append(
                mask_arr if mask_arr is not None else np.ones((1, S, S), np.float32)
            )
            crops_out.append(crop_params)
            K_crop_out.append(K_crop)

        images_arr = np.stack(imgs_out)
        image_masks = np.stack(masks_out)
        crop_parameters = np.stack(crops_out)
        non_ndc_K = np.stack(K_crop_out)
        ndc_K = np.stack([pp.ndc_intrinsics(k, (S, S)) for k in non_ndc_K])

        # Camera normalization (identity for 'object' coordinates —
        # base.py:640-681; first_camera = relative to camera 0).
        scale = np.ones(3, dtype=np.float64)
        coordinate_transform = np.eye(4)
        norm_poses = poses.copy()
        if cfg.coordinate == "first_camera":
            coordinate_transform = original_poses[0].copy()
            norm_poses = poses @ np.linalg.inv(poses[0])
        if cfg.normalize_trans:
            t = norm_poses[:, :3, 3]
            idx = np.arange(T)
            mask = idx != query_idx
            if cfg.coordinate == "first_camera" and mask.sum() > 1:
                mask = mask & (idx != 0)
            sel = t[mask]
            if cfg.max_norm:
                s = np.linalg.norm(sel, axis=-1).max()
            else:
                s = np.linalg.norm(sel) / np.sqrt(len(sel)) / 2.0
            s = float(np.clip(s, 0.01, 100.0))
            norm_poses[:, :3, 3] /= s
            scale = scale * s
        scale_arr = np.broadcast_to(scale, (T, 3)).copy()

        batch: Dict[str, np.ndarray] = {
            "images": images_arr.astype(dtype),
            "original_images": list(image_paths),
            "intrinsics": ndc_K.astype(dtype),
            "non_ndc_intrinsics": non_ndc_K.astype(dtype),
            "original_intrinsics": original_intrinsics.astype(dtype),
            "poses": norm_poses.astype(dtype),
            "original_poses": original_poses.astype(dtype),
            "coordinate_transform": coordinate_transform.astype(dtype),
            "scale": scale_arr.astype(dtype),
            "crop_parameters": crop_parameters.astype(dtype),
            "image_masks": image_masks.astype(dtype),
            "original_shape": np.asarray(shapes, dtype=dtype),
            "model_path": self.get_model_path(cat) or "none",
            "query_idx": np.asarray(query_idx, dtype=np.int32),
            "dataset": self.dataset,
        }
        if self.split == "test":
            batch["cat"] = cat.split("_")[0]

        if bbox3d is not None:
            bbox3d_rep = np.broadcast_to(bbox3d, (T, 8, 3)).copy()
            proj_crop = np.stack(
                [
                    pp.project_points_f32(non_ndc_K[i], norm_poses[i], bbox3d32)
                    for i in range(T)
                ]
            )
            norm_proj = np.clip(proj_crop / np.array([S, S]) * 2.0 - 1.0, -5.0, 5.0)
            batch["bbox_3d"] = bbox3d_rep.astype(dtype)
            batch["bbox_3d_original"] = bbox3d_rep.astype(dtype)
            batch["bbox_proj_crop"] = norm_proj.astype(dtype)
            batch["bbox_proj_pix"] = proj_crop.astype(dtype)  # unclamped pixels
            if cfg.pose_representation == "bb8" and not cfg.device_bbox_feat:
                batch["bbox_feat"] = pp.make_bbox_features_np(
                    proj_crop, cfg.bbox_representation, S, S
                ).astype(dtype)
        return batch

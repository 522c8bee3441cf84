"""Host-side preprocessing: crop / pad / resize / intrinsics adjustment.

Numpy+PIL equivalent of the reference's preprocessing chain
(src/datasets/utils/preprocess.py:22-300 and the NDC round-trip in
src/datasets/base.py:535-626). The geometry here has jittable twins in
boxdreamer_tpu.ops.camera (tested for parity); PIL is only used for decode,
pad, crop, and bilinear resize.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageOps


def square_bbox(bbox: Optional[np.ndarray], padding: float = 0.1) -> Optional[np.ndarray]:
    """Square bbox around the center (reference preprocess.py:22-45).

    NOTE: the default padding is 0.1 — the reference docstring claims 0.0
    but its signature says 0.1, and the process_data call site
    (base.py:547) relies on the default, so crops are 10% looser than the
    projected box. Found by the end-to-end dataset golden test."""
    if bbox is None:
        return None
    in_dtype = np.asarray(bbox).dtype
    bbox = np.asarray(bbox, dtype=np.float64)
    center = (bbox[:2] + bbox[2:]) / 2.0
    size = (bbox[2:] - bbox[:2]).max() / 2.0 * (1.0 + padding)
    out = np.array(
        [center[0] - size, center[1] - size, center[0] + size, center[1] + size]
    )
    # The reference's astype defaults to type(bbox[0]) — an INTEGER input
    # box (e.g. MOPED's mask-derived boxes) yields an int-truncated square
    # box (preprocess.py:35-44).
    if in_dtype.kind in "iu":
        out = out.astype(in_dtype)
    return out


def bbox_from_projection(proj: np.ndarray) -> np.ndarray:
    """Enclosing 2D box of projected 3D-box corners (bbox_utils.py:62-76)."""
    return np.array(
        [proj[:, 0].min(), proj[:, 1].min(), proj[:, 0].max(), proj[:, 1].max()]
    )


def project_points(K: np.ndarray, pose: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """3D -> pixel projection (camera_utils.py:9-59)."""
    cam = pts @ pose[:3, :3].T + pose[:3, 3]
    proj = cam @ K[:3, :3].T
    return proj[:, :2] / proj[:, 2:3]


def pca_bbox_corners(pts: np.ndarray) -> np.ndarray:
    """PCA-aligned 3D box corners (reference prepare_bbox3d's co3d/moped
    branch, bbox_utils.py:139-160): rotate to principal axes, take the
    axis-aligned box there, rotate back. NOTE: dead in the reference's
    data pipeline — its only call site passes no ``dataset`` argument
    (base.py:436) — but kept for API parity with the function itself."""
    centroid = pts.mean(axis=0)
    centered = pts - centroid
    eigval, eigvec = np.linalg.eigh(np.cov(centered, rowvar=False))
    eigvec = eigvec[:, np.argsort(eigval)[::-1]]
    corners = bbox_corners_from_points(centered @ eigvec)
    return corners @ eigvec.T + centroid


def project_points_f32(K: np.ndarray, pose: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """3D -> pixel projection replicating the reference's reproj_pytorch
    (camera_utils.py:9-59) bit-for-bit: every operand cast to float32, then
    (K_homo @ pose) @ pts_homo in f32, then the perspective divide in f32.

    The dataset pipeline's crop boxes derive from this projection, and the
    downstream "is the box already square" branch (preprocess.py:167) is a
    float-equality knife edge — computing in f64 flips it on real data, so
    the f32 rounding IS the contract."""
    K32 = np.zeros((3, 4), dtype=np.float32)
    K32[:, :3] = K[:3, :3]
    pose32 = np.asarray(pose, dtype=np.float32).reshape(4, 4)
    pts32 = np.concatenate(
        [np.asarray(pts, np.float32), np.ones((len(pts), 1), np.float32)], axis=1
    ).T
    r = (K32 @ pose32) @ pts32  # f32 matmuls, same association as torch
    return (r[:2] / r[2:3]).T


def make_mask_by_bbox(
    bbox: Optional[np.ndarray], size_wh: Tuple[int, int]
) -> Image.Image:
    """Rectangle mask image from a bbox; full-white when bbox is None
    (reference make_mask_by_bbox, bbox_utils.py:37-59)."""
    w, h = size_wh
    if bbox is None:
        return Image.fromarray(np.full((h, w), 255, np.uint8))
    mask = np.zeros((h, w), np.uint8)
    x0, y0, x1, y1 = (int(v) for v in bbox)
    mask[max(y0, 0) : max(y1, 0), max(x0, 0) : max(x1, 0)] = 255
    return Image.fromarray(mask)


def pad_image_for_bbox(
    image: Image.Image, bbox: np.ndarray
) -> Tuple[Image.Image, Optional[dict]]:
    """Pad so the bbox fits inside the image (preprocess.py:86-120)."""
    width, height = image.size
    x_min, y_min, x_max, y_max = bbox
    if (x_max - x_min) > width and (y_max - y_min) > height:
        return image, None
    if x_min < 0 or y_min < 0 or x_max > width or y_max > height:
        left = max(0.0, -x_min)
        top = max(0.0, -y_min)
        right = max(0.0, x_max - width)
        bottom = max(0.0, y_max - height)
        image = ImageOps.expand(
            image, (int(left), int(top), int(right), int(bottom)), fill=(0, 0, 0)
        )
        return image, {"left": left, "top": top, "right": right, "bottom": bottom}
    return image, None


def adjust_intrinsics_for_padding(K: np.ndarray, padding: dict) -> np.ndarray:
    """Shift principal point for left/top padding (preprocess.py:48-52)."""
    K = K.copy()
    K[0, 2] += padding.get("left", 0)
    K[1, 2] += padding.get("top", 0)
    return K


def calculate_crop_parameters(
    image_size_wh: Tuple[int, int], bbox: np.ndarray
) -> np.ndarray:
    """NDC crop parameters (preprocess.py:55-83)."""
    bbox = np.asarray(bbox, dtype=np.float64)
    crop_center = (bbox[:2] + bbox[2:]) / 2.0
    width, height = image_size_wh
    length = max(width, height)
    scale = length / min(width, height)
    crop_center = crop_center + (length - np.array([width, height])) / 2.0
    normalized_center = scale - 2.0 * scale * crop_center / length
    crop_width = 2.0 * scale * (bbox[2] - bbox[0]) / length
    return np.array(
        [-normalized_center[0], -normalized_center[1], crop_width, scale],
        dtype=np.float32,
    )


def crop_image(
    image: Image.Image,
    bbox: np.ndarray,
    bbox_obj: Optional[np.ndarray] = None,
) -> Image.Image:
    """Crop to bbox (padding with black where it exceeds the image); if
    bbox_obj is given, black out everything outside it first
    (preprocess.py:202-274 — the mask_bg background blackout)."""
    if bbox_obj is not None:
        mask = Image.new("L", image.size, 0)
        draw = ImageDraw.Draw(mask)
        draw.rectangle([int(v) for v in bbox_obj], fill=255)
        image = Image.composite(image, Image.new("RGB", image.size, (0, 0, 0)), mask)
    # Match the reference's truncation exactly (preprocess.py:256-263 via
    # torchvision F.crop): left/top are int(corner), but width/height are
    # int(difference) — for float bboxes these differ by one pixel.
    x0, y0 = int(bbox[0]), int(bbox[1])
    w, h = int(bbox[2] - bbox[0]), int(bbox[3] - bbox[1])
    out = Image.new(image.mode, (w, h), 0)
    out.paste(image, (-x0, -y0))
    return out


def pad_and_resize_image(
    image: Image.Image,
    img_size: int,
    bbox_anno: Optional[np.ndarray] = None,
    mask: Optional[Image.Image] = None,
    bbox_obj: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray, np.ndarray]:
    """Square-crop around the bbox (or center-crop the longest side) and
    resize to img_size (preprocess.py:123-199).

    Returns (image (3,S,S) float32 in [0,1], mask (1,S,S) or None,
    crop_params (4,), crop bbox (4,))."""
    w, h = image.size
    if bbox_anno is None or not np.asarray(bbox_anno).any():
        crop_dim = max(w, h)
        top = (h - crop_dim) // 2
        left = (w - crop_dim) // 2
        bbox = np.array([left, top, left + crop_dim, top + crop_dim], dtype=np.float64)
    else:
        bbox = np.asarray(bbox_anno, dtype=np.float64)
        if (bbox[2] - bbox[0]) != (bbox[3] - bbox[1]):
            # The reference re-squares with padding=0.0 and astype=int here
            # (preprocess.py:166-168), i.e. truncation toward zero — and
            # since base.py passes a float square_bbox as bbox_anno, float
            # jitter makes this path common.
            bbox = square_bbox(bbox, padding=0.0).astype(np.int64).astype(np.float64)

    crop_params = calculate_crop_parameters((w, h), bbox)
    cropped = crop_image(image, bbox, bbox_obj)
    resized = cropped.resize((img_size, img_size), Image.BILINEAR)
    arr = np.asarray(resized, dtype=np.float32) / 255.0
    arr = np.clip(arr, 0.0, 1.0).transpose(2, 0, 1)

    mask_arr = None
    if mask is not None:
        mask_c = crop_image(mask.convert("L"), bbox)
        mask_r = mask_c.resize((img_size, img_size), Image.BILINEAR)
        mask_arr = (np.asarray(mask_r, dtype=np.float32) / 255.0)[None]
        mask_arr = np.clip(mask_arr, 0.0, 1.0)
        arr = arr * mask_arr

    return arr, mask_arr, crop_params, bbox


def adjust_intrinsics_for_crop_resize(
    K: np.ndarray, crop_xyxy: np.ndarray, out_size: int
) -> np.ndarray:
    """Pixel-space intrinsics after crop+resize — numerically equal to the
    reference's NDC round-trip (base.py:566-626; parity proven in
    tests/ops/test_camera.py)."""
    crop_w = crop_xyxy[2] - crop_xyxy[0]
    crop_h = crop_xyxy[3] - crop_xyxy[1]
    sx, sy = out_size / crop_w, out_size / crop_h
    K_new = K.copy().astype(np.float64)
    K_new[0, 0] *= sx
    K_new[1, 1] *= sy
    K_new[0, 2] = (K[0, 2] - crop_xyxy[0]) * sx
    K_new[1, 2] = (K[1, 2] - crop_xyxy[1]) * sy
    return K_new


def ndc_intrinsics(K: np.ndarray, size_wh: Tuple[float, float]) -> np.ndarray:
    """Pixel K -> PyTorch3D-style screen-NDC K (camera_transform.py:80-89)."""
    half_w, half_h = size_wh[0] / 2.0, size_wh[1] / 2.0
    K_ndc = K.copy().astype(np.float64)
    K_ndc[0, 0] = K[0, 0] / half_w
    K_ndc[1, 1] = K[1, 1] / half_h
    K_ndc[0, 2] = (half_w - K[0, 2]) / half_w
    K_ndc[1, 2] = (half_h - K[1, 2]) / half_h
    return K_ndc


def make_heatmap_features_np(
    bbox_2d: np.ndarray, H: int, W: int, joint_frames: bool = True
) -> np.ndarray:
    """Numpy twin of ops.heatmap.make_heatmap_features for loader workers
    (parity-tested against the jax op AND the real reference function).
    bbox_2d: (..., 8, 2) -> (..., 8, H, W).

    joint_frames=True reproduces the reference's per-corner max over ALL
    frames of the sample jointly (bbox_utils.py:303 — a global ``.max()``
    over the (T, H, W) slice), which is how loader targets are built."""
    bbox_2d = np.asarray(bbox_2d, dtype=np.float32)
    xs = np.arange(W, dtype=np.float32)
    ys = np.arange(H, dtype=np.float32)
    dx = bbox_2d[..., :, 0, None, None] - xs[None, None, :]
    dy = bbox_2d[..., :, 1, None, None] - ys[None, :, None]
    dist = np.sqrt(dx * dx + dy * dy)
    center = bbox_2d.mean(axis=-2)
    corner_to_center = np.linalg.norm(bbox_2d - center[..., None, :], axis=-1)
    scale = np.maximum((corner_to_center / 10.0) ** 2, 1e-12)
    hm = np.exp(-dist / scale[..., None, None])
    if joint_frames and bbox_2d.ndim >= 3:
        peak = hm.max(axis=(-4, -2, -1), keepdims=True)
    else:
        peak = hm.max(axis=(-2, -1), keepdims=True)
    hm = hm / np.maximum(peak, 1e-12)
    return hm * 2.0 - 1.0


def make_voting_features_np(bbox_2d: np.ndarray, H: int, W: int) -> np.ndarray:
    """Numpy twin of ops.heatmap.make_voting_features: (..., 16, H, W)."""
    bbox_2d = np.asarray(bbox_2d, dtype=np.float32)
    xs = np.arange(W, dtype=np.float32)
    ys = np.arange(H, dtype=np.float32)
    lead = bbox_2d.shape[:-2]
    dx = np.broadcast_to(
        (bbox_2d[..., :, 0, None, None] - xs[None, None, :]) / W, lead + (8, H, W)
    )
    dy = np.broadcast_to(
        (bbox_2d[..., :, 1, None, None] - ys[None, :, None]) / H, lead + (8, H, W)
    )
    return np.stack([dx, dy], axis=-3).reshape(lead + (16, H, W))


def make_bbox_features_np(bbox_2d: np.ndarray, representation: str, H: int, W: int):
    if representation == "heatmap":
        return make_heatmap_features_np(bbox_2d, H, W)
    if representation == "voting":
        return make_voting_features_np(bbox_2d, H, W)
    raise NotImplementedError(
        f"host-side features for {representation} not implemented; use the jax op"
    )


def bbox_corners_from_points(pts: np.ndarray) -> np.ndarray:
    """Axis-aligned 3D box corners of a point cloud in the reference's corner
    order (vis_utils.py:get_3d_bbox_from_pts:1123-1170; same bit order as
    bbox_utils.consist_bbox3d:189-202)."""
    mn = pts.min(axis=0)
    mx = pts.max(axis=0)
    bits = np.array(
        [
            [0, 0, 0],
            [0, 1, 0],
            [1, 1, 0],
            [1, 0, 0],
            [0, 0, 1],
            [0, 1, 1],
            [1, 1, 1],
            [1, 0, 1],
        ],
        dtype=np.float64,
    )
    return mn + bits * (mx - mn)

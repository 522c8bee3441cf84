"""Qualitative-panel builders: ray colorization, image grids, labels,
heatmap/voting-map visualization, and the per-query video-frame compositor.

PIL/numpy/matplotlib equivalents of the reference's visualization surface
(src/lightning/utils/vis/vis_utils.py:593-1032 — visualize_direction_as_
color, visualize_moment_as_color, create_ref_matrix, add_text_to_image,
add_label, arrange_images_grid, visualize_and_label_rays,
process_video_frames, draw_bbox_vector_map — and plot_utils.py:21-42
blend_img_heatmap / error_colormap). No cv2/plotly/torch dependency: all
inputs are numpy (images HWC float [0,1] or uint8).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

__all__ = [
    "direction_as_color",
    "moment_as_color",
    "arrange_images_grid",
    "create_ref_matrix",
    "add_label",
    "add_text_to_image",
    "blend_img_heatmap",
    "error_colormap",
    "draw_bbox_vector_map",
    "heatmap_grid",
    "visualize_and_label_rays",
    "compose_query_panel",
    "frames_from_batch",
]


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[0] < img.shape[2]:
        img = np.transpose(img, (1, 2, 0))
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return img


def direction_as_color(rays: np.ndarray) -> np.ndarray:
    """Ray DIRECTIONS -> RGB (reference visualize_direction_as_color,
    vis_utils.py:593-614): normalize to unit length, map [-1, 1] -> [0, 1].

    Args:
        rays: (H, W, 6) plucker maps (direction = last 3 channels, matching
            the reference's ``rays[..., 3:]``) or (H, W, 3) directions.
    """
    rays = np.asarray(rays, dtype=np.float64)
    d = rays[..., 3:6] if rays.shape[-1] >= 6 else rays[..., :3]
    n = np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return ((d / n + 1.0) / 2.0 * 255).astype(np.uint8)


def moment_as_color(rays: np.ndarray) -> np.ndarray:
    """Ray MOMENTS -> RGB (reference visualize_moment_as_color,
    vis_utils.py:616-637): scale by the max norm, map [-1, 1] -> [0, 1]."""
    rays = np.asarray(rays, dtype=np.float64)
    m = rays[..., 0:3]
    scale = max(float(np.linalg.norm(m, axis=-1).max()), 1e-9)
    return ((m / scale + 1.0) / 2.0 * 255).astype(np.uint8)


def arrange_images_grid(
    images: Sequence[np.ndarray], grid_size: Optional[int] = None
) -> np.ndarray:
    """Pack N images into a grid (reference arrange_images_grid,
    vis_utils.py:717-733); empty cells are black."""
    imgs = [_to_uint8(im) for im in images]
    n = len(imgs)
    if grid_size is None:
        grid_size = math.ceil(math.sqrt(max(n, 1)))
    h, w = imgs[0].shape[:2]
    grid = np.zeros((grid_size * h, grid_size * w, 3), dtype=np.uint8)
    for i, im in enumerate(imgs[: grid_size * grid_size]):
        r, c = divmod(i, grid_size)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    return grid


def create_ref_matrix(
    ref_images: np.ndarray, matrix_size: int, single_img_shape: Tuple[int, int]
) -> np.ndarray:
    """Reference-image matrix (reference create_ref_matrix,
    vis_utils.py:639-666)."""
    h, w = single_img_shape[:2]
    resized = [
        np.asarray(Image.fromarray(_to_uint8(im)).resize((w, h), Image.BILINEAR))
        for im in ref_images
    ]
    return arrange_images_grid(resized, matrix_size)


def add_label(
    image: np.ndarray, text: str, height: int = 28, bg=(0, 0, 0), fg=(255, 255, 255)
) -> np.ndarray:
    """Prepend a text banner above the image (reference add_label,
    vis_utils.py:688-715)."""
    img = _to_uint8(image)
    banner = Image.new("RGB", (img.shape[1], height), bg)
    draw = ImageDraw.Draw(banner)
    draw.text((4, max((height - 12) // 2, 0)), text, fill=fg)
    return np.concatenate([np.asarray(banner), img], axis=0)


def add_text_to_image(
    image: np.ndarray, text: str, position: Tuple[int, int] = (4, 4),
    fg=(255, 255, 0),
) -> np.ndarray:
    """Draw text onto the image in place-equivalent fashion (reference
    add_text_to_image, vis_utils.py:668-686)."""
    pil = Image.fromarray(_to_uint8(image).copy())
    ImageDraw.Draw(pil).text(position, text, fill=fg)
    return np.asarray(pil)


def blend_img_heatmap(
    img: np.ndarray, heatmap: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Alpha-blend a scalar heatmap (colormapped) over an image (reference
    plot_utils.blend_img_heatmap:21-31)."""
    import matplotlib.cm as cm

    img8 = _to_uint8(img).astype(np.float64)
    hm = np.asarray(heatmap, dtype=np.float64)
    if hm.ndim == 3:
        hm = hm.mean(axis=-1) if hm.shape[-1] <= 4 else hm[..., 0]
    rng = hm.max() - hm.min()
    hm = (hm - hm.min()) / (rng if rng > 0 else 1.0)
    colored = cm.jet(hm)[..., :3] * 255
    out = (1 - alpha) * img8 + alpha * colored
    return np.clip(out, 0, 255).astype(np.uint8)


def error_colormap(x: np.ndarray, alpha: float = 1.0) -> np.ndarray:
    """Green-to-red confidence colormap (reference plot_utils.
    error_colormap:34-40): rgba = (1-x, x, 0.2, alpha), clipped."""
    x = np.asarray(x, dtype=np.float64)
    return np.clip(
        np.stack([2 - x * 2, x * 2, np.zeros_like(x), np.full_like(x, alpha)], -1),
        0,
        1,
    )


def draw_bbox_vector_map(
    bbox_map: np.ndarray, rgb: Optional[np.ndarray] = None
) -> np.ndarray:
    """Voting offset field -> color (reference draw_bbox_vector_map,
    vis_utils.py:1499-...): per-pixel mean (dx, dy) over the 8 corners mapped
    to the red/green channels, magnitude to blue; optionally blended 50/50
    over the RGB frame.

    Args:
        bbox_map: (16, H, W) or (H, W, 16) interleaved (dx0, dy0, dx1, ...)
            normalized offsets in roughly [-1, 1].
    """
    m = np.asarray(bbox_map, dtype=np.float64)
    if m.ndim == 3 and m.shape[0] in (16, 24):
        m = np.transpose(m, (1, 2, 0))
    c = m.shape[-1] // 2 if m.shape[-1] in (16,) else m.shape[-1] // 3
    field = m[..., : 2 * c].reshape(m.shape[:2] + (c, 2))
    dx = field[..., 0].mean(-1)
    dy = field[..., 1].mean(-1)
    mag = np.sqrt(dx**2 + dy**2)
    mag = mag / max(mag.max(), 1e-9)
    img = np.stack(
        [(dx + 1) / 2, (dy + 1) / 2, mag], axis=-1
    )
    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if rgb is not None:
        img = ((img.astype(np.float64) + _to_uint8(rgb).astype(np.float64)) / 2).astype(
            np.uint8
        )
    return img


def heatmap_grid(
    heatmaps: np.ndarray, rgb: Optional[np.ndarray] = None, alpha: float = 0.5
) -> np.ndarray:
    """Per-corner heatmap panel grid (the reference's draw_bbox_heatmap /
    _visualize_bbox_feat surface, vis_utils.py:173-214): one blended panel
    per corner channel, packed 3x3.

    Args:
        heatmaps: (8, H, W) in [-1, 1] (heatmap representation).
        rgb: optional (3, H, W) or (H, W, 3) frame to blend under each panel.
    """
    hms = np.asarray(heatmaps, dtype=np.float64)
    base = (
        _to_uint8(rgb)
        if rgb is not None
        else np.zeros(hms.shape[1:] + (3,), dtype=np.uint8)
    )
    panels = [
        add_label(blend_img_heatmap(base, (hms[i] + 1) / 2, alpha), f"corner {i}")
        for i in range(hms.shape[0])
    ]
    return arrange_images_grid(panels)


def visualize_and_label_rays(
    gt_rays: np.ndarray, pred_rays: np.ndarray
) -> np.ndarray:
    """GT vs predicted plucker rays side by side, directions and moments
    (reference visualize_and_label_rays, vis_utils.py:735-765)."""
    rows = [
        np.concatenate(
            [
                add_label(direction_as_color(gt_rays), "GT dir"),
                add_label(direction_as_color(pred_rays), "Pred dir"),
            ],
            axis=1,
        ),
        np.concatenate(
            [
                add_label(moment_as_color(gt_rays), "GT moment"),
                add_label(moment_as_color(pred_rays), "Pred moment"),
            ],
            axis=1,
        ),
    ]
    return np.concatenate(rows, axis=0)


def compose_query_panel(
    query_img: np.ndarray,
    ref_images: Sequence[np.ndarray],
    pred_img: Optional[np.ndarray] = None,
    metrics: Optional[Dict[str, float]] = None,
    max_refs: int = 15,
) -> np.ndarray:
    """One sample's video frame (reference process_video_frames inner loop,
    vis_utils.py:767-965): [reference grid | labeled query/pred column],
    with metric values stamped under the query."""
    q = _to_uint8(query_img)
    h, w = q.shape[:2]
    refs = list(ref_images)[:max_refs]
    grid_size = math.ceil(math.sqrt(max(len(refs), 1)))
    ref_matrix = create_ref_matrix(refs, grid_size, (h, w)) if refs else np.zeros(
        (h, w, 3), np.uint8
    )
    target = 2 * h
    ref_matrix = np.asarray(
        Image.fromarray(ref_matrix).resize((target, target), Image.BILINEAR)
    )
    left = add_label(ref_matrix, "Reference Images")

    col = [add_label(q, "Query (GT overlay)")]
    if pred_img is not None:
        col.append(add_label(_to_uint8(pred_img), "Prediction"))
    right = np.concatenate(col, axis=0)
    if metrics:
        text = "  ".join(f"{k}={v:.3g}" for k, v in metrics.items())
        right = add_label(right, text, height=22, bg=(20, 20, 60))

    hh = max(left.shape[0], right.shape[0])

    def padto(a):
        if a.shape[0] == hh:
            return a
        pad = np.zeros((hh - a.shape[0], a.shape[1], 3), np.uint8)
        return np.concatenate([a, pad], axis=0)

    return np.concatenate([padto(left), padto(right)], axis=1)


def frames_from_batch(
    batch: Dict[str, np.ndarray], metrics: Optional[Dict[str, Sequence[float]]] = None
) -> List[np.ndarray]:
    """Compose one panel per batch sample (reference process_video_frames,
    vis_utils.py:767-965). Expects 'images' (B, T, 3, H, W) and 'query_idx'
    (B,); optional 'pred_images'."""
    images = np.asarray(batch["images"])
    query_idx = np.asarray(batch["query_idx"]).astype(int)
    pred_images = batch.get("pred_images")
    B, T = images.shape[:2]
    frames = []
    for b in range(B):
        q = query_idx[b]
        refs = [images[b, t] for t in range(T) if t != q]
        met = (
            {k: float(v[b]) for k, v in metrics.items()} if metrics else None
        )
        frames.append(
            compose_query_panel(
                images[b, q],
                refs,
                pred_img=None if pred_images is None else pred_images[b, q],
                metrics=met,
            )
        )
    return frames

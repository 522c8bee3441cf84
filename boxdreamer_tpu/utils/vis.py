"""Visualization utilities (PIL/numpy + optional matplotlib).

Equivalent of the reference's vis stack (src/lightning/utils/vis/
vis_utils.py:31-1715, plot_utils.py, mesh_utils.py) minus the plotly/trimesh
dependencies: 3D-box wireframe drawing, reprojection, heatmap overlays,
prediction-vs-GT comparison strips, and matplotlib camera-frustum plots.
All functions return PIL images or uint8 numpy arrays so they can feed any
logger (TensorBoard-style writers, file dumps, the demo compositor).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

# Box edges for the corner order used everywhere in the framework
# (bits table in data/preprocess.bbox_corners_from_points; reference
# vis_utils.draw_3d_box:1329 uses the same wireframe).
BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),  # bottom face (z=min)
    (4, 5), (5, 6), (6, 7), (7, 4),  # top face (z=max)
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
]


def to_pil(image) -> Image.Image:
    """Accepts PIL, (H, W, 3) uint8/float, or (3, H, W) float arrays."""
    if isinstance(image, Image.Image):
        return image.copy()
    arr = np.asarray(image)
    if arr.ndim == 3 and arr.shape[0] in (1, 3):
        arr = arr.transpose(1, 2, 0)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return Image.fromarray(arr)


def reproj(K: np.ndarray, pose: np.ndarray, pts3d: np.ndarray) -> np.ndarray:
    """3D -> pixel projection (reference vis_utils.reproj:1206)."""
    cam = pts3d @ pose[:3, :3].T + pose[:3, 3]
    uv = cam @ K[:3, :3].T
    return uv[:, :2] / uv[:, 2:3]


def draw_3d_box(
    image,
    corners_2d: np.ndarray,
    color: Tuple[int, int, int] = (0, 255, 0),
    width: int = 2,
    draw_points: bool = False,
) -> Image.Image:
    """Draw the 8-corner box wireframe (reference draw_3d_box,
    vis_utils.py:1329)."""
    img = to_pil(image)
    draw = ImageDraw.Draw(img)
    c = np.asarray(corners_2d, dtype=np.float64)
    for a, b in BOX_EDGES:
        draw.line([tuple(c[a]), tuple(c[b])], fill=color, width=width)
    if draw_points:
        for p in c:
            draw.ellipse(
                [p[0] - 3, p[1] - 3, p[0] + 3, p[1] + 3], outline=color, width=2
            )
    return img


def draw_projected_box(
    image, K: np.ndarray, pose: np.ndarray, bbox_3d: np.ndarray, **kw
) -> Image.Image:
    """Project + draw in one step."""
    return draw_3d_box(image, reproj(K, pose, bbox_3d), **kw)


def heatmap_overlay(
    image, heatmaps: np.ndarray, alpha: float = 0.5
) -> Image.Image:
    """Overlay the max over corner heatmaps as a red-hot blend
    (reference VisUtils bbox-feature heatmap rendering).

    Args:
        heatmaps: (8, H, W) in [-1, 1] or [0, 1].
    """
    img = to_pil(image).convert("RGB")
    hm = np.asarray(heatmaps, dtype=np.float32)
    if hm.min() < 0:
        hm = (hm + 1.0) / 2.0
    hm = hm.max(axis=0)
    hm = hm / max(hm.max(), 1e-6)
    if hm.shape != img.size[::-1]:
        hm_img = Image.fromarray((hm * 255).astype(np.uint8)).resize(img.size)
        hm = np.asarray(hm_img, dtype=np.float32) / 255.0
    base = np.asarray(img, dtype=np.float32)
    heat = np.zeros_like(base)
    heat[..., 0] = hm * 255.0
    heat[..., 1] = (hm**2) * 160.0
    out = base * (1 - alpha * hm[..., None]) + heat * (alpha * hm[..., None])
    return Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))


def draw_keypoints(
    image, kpts: np.ndarray, color=(255, 220, 0), radius: int = 3
) -> Image.Image:
    img = to_pil(image)
    draw = ImageDraw.Draw(img)
    for p in np.asarray(kpts):
        draw.ellipse(
            [p[0] - radius, p[1] - radius, p[0] + radius, p[1] + radius], fill=color
        )
    return img


def compare_boxes(
    image,
    K: np.ndarray,
    pose_pred: np.ndarray,
    pose_gt: np.ndarray,
    bbox_3d: np.ndarray,
) -> Image.Image:
    """Pred (blue) vs GT (green) box overlay — the reference's standard
    qualitative panel."""
    img = draw_projected_box(image, K, pose_gt, bbox_3d, color=(0, 255, 0))
    return draw_projected_box(img, K, pose_pred, bbox_3d, color=(60, 120, 255))


def hstack_images(images: Sequence, pad: int = 4) -> Image.Image:
    imgs = [to_pil(i) for i in images]
    h = max(i.height for i in imgs)
    w = sum(i.width for i in imgs) + pad * (len(imgs) - 1)
    out = Image.new("RGB", (w, h), (30, 30, 30))
    x = 0
    for i in imgs:
        out.paste(i, (x, (h - i.height) // 2))
        x += i.width + pad
    return out


def get_3d_bbox_from_pts(pts: np.ndarray) -> np.ndarray:
    """Axis-aligned box corners of a point cloud (reference
    get_3d_bbox_from_pts, vis_utils.py:1123)."""
    from boxdreamer_tpu.data.preprocess import bbox_corners_from_points

    return bbox_corners_from_points(np.asarray(pts))


def plot_cameras(
    poses: np.ndarray,
    pred_poses: Optional[np.ndarray] = None,
    scale: float = 0.1,
    path: Optional[str] = None,
):
    """Matplotlib 3D camera-frustum plot (replacement for the reference's
    plotly camera visualizer, plot_utils.py). Returns the figure; saves to
    ``path`` if given."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")

    def draw(pose_set, color):
        for pose in pose_set:
            R = pose[:3, :3]
            t = pose[:3, 3]
            center = -R.T @ t
            corners = np.array(
                [[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], dtype=np.float64
            ) * scale
            corners = corners @ R + center  # R^T rows
            for c in corners:
                ax.plot(*zip(center, c), color=color, linewidth=0.8)
            loop = np.vstack([corners, corners[:1]])
            ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], color=color, linewidth=0.8)

    draw(np.asarray(poses), "green")
    if pred_poses is not None:
        draw(np.asarray(pred_poses), "red")
    ax.set_box_aspect([1, 1, 1])
    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


class VisUtils:
    """Accumulates eval samples and renders comparison panels
    (reference VisUtils class, vis_utils.py:31-592)."""

    def __init__(self, max_samples: int = 16):
        self.max_samples = max_samples
        self.samples: List[Dict] = []

    def add_data(
        self,
        image,
        K: np.ndarray,
        pose_pred: np.ndarray,
        pose_gt: np.ndarray,
        bbox_3d: np.ndarray,
        heatmaps: Optional[np.ndarray] = None,
    ):
        if len(self.samples) >= self.max_samples:
            return
        self.samples.append(
            dict(image=image, K=K, pose_pred=pose_pred, pose_gt=pose_gt,
                 bbox_3d=bbox_3d, heatmaps=heatmaps)
        )

    def render(self) -> Optional[Image.Image]:
        if not self.samples:
            return None
        panels = []
        for s in self.samples:
            panel = compare_boxes(
                s["image"], s["K"], s["pose_pred"], s["pose_gt"], s["bbox_3d"]
            )
            if s["heatmaps"] is not None:
                panel = hstack_images(
                    [panel, heatmap_overlay(s["image"], s["heatmaps"])]
                )
            panels.append(panel)
        return hstack_images(panels)

    def reset(self):
        self.samples = []

"""Visualization utilities (PIL/numpy + optional matplotlib).

Equivalent of the reference's vis stack (src/lightning/utils/vis/
vis_utils.py:31-1715, plot_utils.py, mesh_utils.py) minus the plotly/trimesh
dependencies: 3D-box wireframe drawing, reprojection, heatmap overlays,
prediction-vs-GT comparison strips, and matplotlib camera-frustum plots.
All functions return PIL images or uint8 numpy arrays so they can feed any
logger (TensorBoard-style writers, file dumps, the demo compositor).
"""

from __future__ import annotations

import dataclasses
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


@dataclasses.dataclass(frozen=True)
class VisConfig:
    """Mirrors the reference vis config group
    (configs/model/vis/default.yaml:1-3, consumed at vis_utils.py:53-169).

    ``save_n_batches``: how many eval batches contribute samples.
    ``vis_types``: which panels render. Supported here: 'bbox' (pred-vs-GT
    wireframe overlay), 'bbox_feat' (pred + GT corner-heatmap overlays,
    reference _visualize_bbox_feat), 'reprojection' (projected pred/GT
    corner keypoints, reference draw_reprojection_pair), 'scene'
    (matplotlib camera-frustum plot replacing the reference's
    plotly/pt3d scene). Unknown types are ignored, as in the reference.
    ``use_mask``: carried for config parity; the reference's vis path never
    reads it (vis_utils.py has no use_mask consumer — the decoder's
    use_mask flag is a different knob).
    """

    save_n_batches: int = 1
    use_mask: bool = True
    vis_types: Tuple[str, ...] = ("bbox", "bbox_feat")

    @staticmethod
    def from_cfg(node) -> "VisConfig":
        """Build from a config mapping (cfg.model.vis); None -> defaults."""
        if node is None:
            return VisConfig()
        get = node.get if hasattr(node, "get") else lambda k, d=None: getattr(node, k, d)
        return VisConfig(
            save_n_batches=int(get("save_n_batches", 1)),
            use_mask=bool(get("use_mask", True)),
            vis_types=tuple(get("vis_types", ("bbox", "bbox_feat"))),
        )


def fig_to_array(fig) -> np.ndarray:
    """Rasterize a matplotlib figure to (H, W, 3) uint8."""
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    import matplotlib.pyplot as plt

    plt.close(fig)
    return buf.copy()


class VisUtils:
    """Accumulates eval samples and renders panels selected by
    ``VisConfig.vis_types`` (reference VisUtils class, vis_utils.py:31-592;
    batch budget per vis_utils.py:66-84, panel dispatch per :129-169)."""

    def __init__(self, max_samples: int = 16, config: Optional[VisConfig] = None):
        self.config = config or VisConfig()
        self.max_samples = max_samples
        self.samples: List[Dict] = []
        self.batches_seen: set = set()
        self.dataloaders_seen: set = set()

    def batch_allowed(self, batch_id) -> bool:
        """Reference add_data budget (vis_utils.py:66-84): the FIRST batch
        of every new dataloader always contributes (so a multi-dataset eval
        shows every dataset), further batches only until save_n_batches
        total. ``batch_id`` is (dataloader_id, batch_index)."""
        if batch_id in self.batches_seen:
            return True
        dl = batch_id[0] if isinstance(batch_id, tuple) else batch_id
        if dl not in self.dataloaders_seen:
            self.dataloaders_seen.add(dl)
            self.batches_seen.add(batch_id)
            return True
        if len(self.batches_seen) >= self.config.save_n_batches:
            return False
        self.batches_seen.add(batch_id)
        return True

    def add_data(
        self,
        image,
        K: np.ndarray,
        pose_pred: np.ndarray,
        pose_gt: np.ndarray,
        bbox_3d: np.ndarray,
        heatmaps: Optional[np.ndarray] = None,
        gt_heatmaps: Optional[np.ndarray] = None,
        batch_id=None,
    ):
        if len(self.samples) >= self.max_samples:
            return
        if batch_id is not None and not self.batch_allowed(batch_id):
            return
        self.samples.append(
            dict(image=image, K=K, pose_pred=pose_pred, pose_gt=pose_gt,
                 bbox_3d=bbox_3d, heatmaps=heatmaps, gt_heatmaps=gt_heatmaps)
        )

    def render(self) -> Optional[Image.Image]:
        """One horizontal strip per sample; columns selected by vis_types."""
        if not self.samples:
            return None
        types = self.config.vis_types
        panels = []
        for s in self.samples:
            cols = []
            if "bbox" in types:
                cols.append(
                    compare_boxes(
                        s["image"], s["K"], s["pose_pred"], s["pose_gt"],
                        s["bbox_3d"],
                    )
                )
            if "bbox_feat" in types and s["heatmaps"] is not None:
                cols.append(heatmap_overlay(s["image"], s["heatmaps"]))
                if s["gt_heatmaps"] is not None:
                    cols.append(heatmap_overlay(s["image"], s["gt_heatmaps"]))
            if "reprojection" in types:
                img = draw_keypoints(
                    s["image"], reproj(s["K"], s["pose_gt"], s["bbox_3d"]),
                    color=(0, 255, 0),
                )
                cols.append(
                    draw_keypoints(
                        img, reproj(s["K"], s["pose_pred"], s["bbox_3d"]),
                        color=(60, 120, 255),
                    )
                )
            if not cols:  # nothing selected for per-sample panels
                continue
            panels.append(hstack_images(cols))
        if "scene" in types:
            fig = plot_cameras(
                np.stack([s["pose_gt"] for s in self.samples]),
                np.stack([s["pose_pred"] for s in self.samples]),
            )
            panels.append(to_pil(fig_to_array(fig)))
        if not panels:
            return None
        return hstack_images(panels)

    def reset(self):
        self.samples = []
        self.batches_seen = set()
        self.dataloaders_seen = set()

"""Evaluation metric suite: R/t errors, Proj2D, ADD / ADD-S (+AUCs).

Equivalent of the reference Metrics class
(src/lightning/utils/metrics/metric_utils.py:162-800) with the same metric
definitions, thresholds and aggregate key naming, minus the torch/scipy/
sklearn dependencies: the ADD-S nearest-neighbor uses a chunked numpy
brute-force (or an on-device jax matmul for fixed-size point sets) instead
of cKDTree, and AUC integration uses np.trapz (identical trapezoid rule to
sklearn.metrics.auc).

Pose un-normalization before metric computation matches the reference
(metric_utils.py:281-283): ``pose_pred[:3,3] *= scale; pose_pred = pose_pred
@ coordinate_transform``.
"""

from __future__ import annotations

import dataclasses
import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class MetricsConfig:
    """Mirrors configs/model/metrics/default.yaml of the reference."""

    metrics_list: Sequence[str] = ("pose_error", "ADD", "proj2d")
    t_scale: Optional[str] = "m"  # 'm' | 'mm' | None
    pose_thresholds: Sequence[float] = (1, 3, 5, 10, 15, 20, 30)
    proj2d_thres: float = 5.0


def query_pose_error(pose_pred: np.ndarray, pose_gt: np.ndarray, t_scale="m"):
    """(R error deg, t error cm, in-plane rotation error deg)
    (reference metric_utils.py:162-210)."""
    pose_pred = pose_pred[:3] if pose_pred.shape[0] == 4 else pose_pred
    pose_gt = pose_gt[:3] if pose_gt.shape[0] == 4 else pose_gt

    t_err = np.linalg.norm(pose_pred[:, 3] - pose_gt[:, 3])
    if t_scale == "m":
        t_err *= 100.0
    elif t_scale == "mm":
        t_err /= 10.0

    rot_diff = pose_pred[:, :3] @ pose_gt[:, :3].T
    trace = np.clip(np.trace(rot_diff), -1.0, 3.0)
    r_err = np.rad2deg(np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0)))
    r_err = 0.0 if (np.isnan(r_err) or np.isinf(r_err)) else float(r_err)
    t_err = 0.0 if (np.isnan(t_err) or np.isinf(t_err)) else float(t_err)

    inplane = float(np.abs(np.rad2deg(np.arctan2(rot_diff[1, 0], rot_diff[0, 0]))))
    return r_err, t_err, inplane


def project(xyz: np.ndarray, K: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """3D points -> pixels (reference project_optimized, metric_utils.py:224-240)."""
    pts = xyz @ RT[:, :3].T + RT[:, 3]
    proj = pts @ K.T
    return proj[:, :2] / proj[:, 2:3]


def proj2d_mean_error(
    model_pts: np.ndarray, K: np.ndarray, pose_pred: np.ndarray, pose_gt: np.ndarray
) -> float:
    """Mean pixel distance between projections (metric_utils.py:255-306)."""
    p = project(model_pts, K, pose_pred[:3])
    g = project(model_pts, K, pose_gt[:3])
    return float(np.mean(np.linalg.norm(p - g, axis=1)))


def _nearest_dists(a: np.ndarray, b: np.ndarray, chunk: int = 512) -> np.ndarray:
    """For each point in b, distance to the nearest point in a (brute force,
    chunked to bound memory). Replaces scipy cKDTree (metric_utils.py:379)."""
    a_sq = (a**2).sum(-1)
    out = np.empty(len(b), dtype=np.float64)
    for i in range(0, len(b), chunk):
        bb = b[i : i + chunk]
        d2 = (bb**2).sum(-1)[:, None] + a_sq[None, :] - 2.0 * bb @ a.T
        out[i : i + chunk] = np.sqrt(np.maximum(d2.min(axis=1), 0.0))
    return out


def add_metrics(
    model_pts: np.ndarray, pose_pred: np.ndarray, pose_gt: np.ndarray
) -> Dict[str, float]:
    """ADD / ADD-S raw distances and 0.1-diameter scores
    (metric_utils.py:331-447)."""
    pred = model_pts @ pose_pred[:3, :3].T + pose_pred[:3, 3]
    gt = model_pts @ pose_gt[:3, :3].T + pose_gt[:3, 3]
    add = float(np.mean(np.linalg.norm(pred - gt, axis=-1)))
    adds = float(np.mean(_nearest_dists(pred, gt)))
    diameter = float(
        np.linalg.norm(model_pts.max(axis=0) - model_pts.min(axis=0))
    )
    thres = diameter * 0.1
    return {
        "add": add,
        "adds": adds,
        "add_score": 1.0 if add < thres else 0.0,
        "adds_score": 1.0 if adds < thres else 0.0,
    }


def denormalize_pred_pose(
    pose_pred: np.ndarray, scale: np.ndarray, coordinate_transform: np.ndarray
) -> np.ndarray:
    """Undo dataset-time camera normalization (metric_utils.py:281-283)."""
    pose = pose_pred.copy().astype(np.float64)
    pose[:3, 3] *= np.asarray(scale).reshape(-1)[:3] if np.ndim(scale) else scale
    return pose @ np.asarray(coordinate_transform, dtype=np.float64)


def auc(errs: np.ndarray, max_val: float, n: int = 1000) -> float:
    """Normalized area under the accuracy-vs-threshold curve — trapezoid
    rule, identical to the reference's sklearn.metrics.auc usage
    (metric_utils.py:768-784)."""
    errs = np.asarray(errs)
    thresholds = np.linspace(0.0, max_val, n)
    acc = [(errs <= t).sum() / max(len(errs), 1) for t in thresholds]
    return float(np.trapezoid(acc, thresholds) / max_val)


class Metrics:
    """Per-batch accumulation + end-of-eval aggregation with the reference's
    key naming (aggregate_metrics, metric_utils.py:556-718)."""

    def __init__(self, config: MetricsConfig = MetricsConfig(), dataloader_id: int = 0):
        self.config = config
        self.dataloader_id = dataloader_id
        self.reset()

    def reset(self):
        self._store: Dict[str, Dict[str, List[float]]] = defaultdict(
            lambda: defaultdict(list)
        )
        # Per-image pose/error records for the qualitative tooling
        # (reference path_pose_dict / path_error_dict npy dumps,
        # metric_utils.py:668-678).
        self._pose_records: Dict[str, Dict[str, np.ndarray]] = defaultdict(dict)
        self._error_records: Dict[str, Dict[str, float]] = defaultdict(dict)
        self._last_image_path = None

    def _append(self, name: str, cat: str, value: float):
        self._store[name][cat].append(value)
        if cat != "all":
            self._store[name]["all"].append(value)

    def update(
        self,
        pose_pred: np.ndarray,
        pose_gt: np.ndarray,
        K: np.ndarray,
        model_pts: Optional[np.ndarray] = None,
        scale: np.ndarray | float = 1.0,
        coordinate_transform: Optional[np.ndarray] = None,
        cat: str = "all",
        image_path: Optional[str] = None,
    ):
        """Add one evaluation sample (pose_gt is the original/unnormalized
        GT; pose_pred is in normalized coords and gets un-normalized here)."""
        if coordinate_transform is None:
            coordinate_transform = np.eye(4)
        pred = denormalize_pred_pose(np.asarray(pose_pred), scale, coordinate_transform)
        if image_path is not None:
            self._pose_records[cat][image_path] = pred.astype(np.float32)
            self._last_image_path = (cat, image_path)
        else:
            self._last_image_path = None
        gt = np.asarray(pose_gt, dtype=np.float64)

        if "pose_error" in self.config.metrics_list:
            r, t, ip = query_pose_error(pred, gt, self.config.t_scale)
            self._append("R_errs", cat, r)
            self._append("t_errs", cat, t)
            self._append("inplane_R_errs", cat, ip)
            if self._last_image_path is not None:
                c, p = self._last_image_path
                self._error_records[c][p] = float(r)
        if model_pts is not None and "ADD" in self.config.metrics_list:
            m = add_metrics(model_pts, pred[:3], gt[:3])
            self._append("ADD_0.1d", cat, m["add_score"])
            self._append("ADDs_0.1d", cat, m["adds_score"])
            self._append("ADD_raw", cat, m["add"])
            self._append("ADDs_raw", cat, m["adds"])
        if model_pts is not None and "proj2d" in self.config.metrics_list:
            self._append(
                "proj2D_metric", cat, proj2d_mean_error(model_pts, K, pred[:3], gt[:3])
            )

    def update_image(self, pred_img: np.ndarray, gt_img: np.ndarray,
                     cat: str = "all") -> Optional[float]:
        """Image-metric branch (reference Metrics.rgb_metrics,
        metric_utils.py:131-160): PSNR of the NVS-predicted query image vs
        the GT crop, accumulated per category under 'psnr'. Matches
        torchmetrics.PeakSignalNoiseRatio's default data_range inference:
        the range comes from the TARGET only (torchmetrics functional psnr:
        ``data_range = target.max() - target.min()`` when unset) — using
        the joint pred+gt range would inflate PSNR whenever the raw linear
        NVS output exceeds the [0, 1] crop range. Aggregation is the MEAN
        of per-image dB values — deliberately: the reference appends each
        ``self.psnr(...)`` forward-call return (per-image, batch-local
        range) and np.mean's the list (rgb_metrics :148-158 +
        aggregate_metrics :647-651), it never reads the torchmetrics
        global ``.compute()``. No-op unless 'image' is in metrics_list."""
        if "image" not in self.config.metrics_list:
            return None
        p = np.asarray(pred_img, dtype=np.float64)
        g = np.asarray(gt_img, dtype=np.float64)
        data_range = float(g.max() - g.min())
        mse = float(np.mean((p - g) ** 2))
        if mse == 0.0:
            psnr = float("inf")
        else:
            psnr = 10.0 * np.log10(max(data_range, 1e-12) ** 2 / mse)
        self._append("psnr", cat, psnr)
        return psnr

    def merge(self, other: "Metrics"):
        """Merge another accumulator (multi-host / multi-process gather)."""
        for name, cats in other._store.items():
            for cat, vals in cats.items():
                self._store[name][cat].extend(vals)

    def aggregate(self) -> Dict[str, Dict[str, float]]:
        """Aggregate with the reference's key format."""
        did = self.dataloader_id
        agg: Dict[str, Dict[str, float]] = {}
        unit = "cm" if self.config.t_scale else "degree"
        cats = sorted(self._store.get("R_errs", {}).keys()) or ["all"]
        for cat in cats:
            R = np.asarray(self._store["R_errs"].get(cat, []))
            t = np.asarray(self._store["t_errs"].get(cat, []))
            ip = np.asarray(self._store["inplane_R_errs"].get(cat, []))
            if len(R):
                for thr in self.config.pose_thresholds:
                    key = f"{thr}{unit}@{thr}degree_{did}"
                    agg.setdefault(key, {})[cat] = float(
                        np.mean((R < thr) & (t < thr))
                    )
                agg.setdefault(f"avg_err_R_{did}", {})[cat] = float(R.mean())
                agg.setdefault(f"avg_err_t_{did}", {})[cat] = float(t.mean())
                agg.setdefault(f"avg_err_inplane_R_{did}", {})[cat] = float(ip.mean())
                agg.setdefault(f"eval size_{did}", {})[cat] = int(len(R))
            add = self._store.get("ADD_0.1d", {}).get(cat)
            if add:
                agg.setdefault(f"ADD-0.1d {did}", {})[cat] = float(np.mean(add))
                agg.setdefault(f"ADDs-0.1d {did}", {})[cat] = float(
                    np.mean(self._store["ADDs_0.1d"][cat])
                )
                add_raw = np.asarray(self._store["ADD_raw"][cat])
                adds_raw = np.asarray(self._store["ADDs_raw"][cat])
                agg.setdefault(f"ADD-AUC(10cm) {did}", {})[cat] = auc(add_raw, 0.10)
                agg.setdefault(f"ADD-AUC {did}", {})[cat] = auc(add_raw, 0.10)
                agg.setdefault(f"ADDs-AUC(10cm) {did}", {})[cat] = auc(adds_raw, 0.10)
                agg.setdefault(f"ADDs-AUC {did}", {})[cat] = auc(adds_raw, 0.10)
            p2d = self._store.get("proj2D_metric", {}).get(cat)
            if p2d:
                p2d = np.asarray(p2d)
                agg.setdefault(f"proj2D@5px {did}", {})[cat] = float(
                    np.mean(p2d < self.config.proj2d_thres)
                )
                agg.setdefault(f"proj2D-AUC(40px) {did}", {})[cat] = auc(p2d, 40.0)
        # image branch categories may not overlap the pose ones
        for cat, vals in self._store.get("psnr", {}).items():
            if vals:
                agg.setdefault(f"psnr_{did}", {})[cat] = float(np.mean(vals))
        return agg

    def save_json(self, path: str):
        """Write aggregated metrics (reference test_metrics.json,
        BoxDreamer_lightning_model.py:265-268)."""
        with open(path, "w") as f:
            json.dump(self.aggregate(), f, indent=2)

    def save_pose_dict(self, path: Optional[str] = None):
        """Dump {cat: {image_path: pred_pose}} (reference
        path_pose_dict_<id>.npy, metric_utils.py:677-678) — the input format
        of tools/vis_results.py."""
        path = path or f"path_pose_dict_{self.dataloader_id}.npy"
        # The reference's dict always carries an (empty) 'all' bucket —
        # per-path records are appended per-category only
        # (metric_utils.py:497 setdefault vs :539 append).
        pose_rec = {"all": {}, **{k: dict(v) for k, v in self._pose_records.items()}}
        err_rec = {"all": {}, **{k: dict(v) for k, v in self._error_records.items()}}
        np.save(path, pose_rec, allow_pickle=True)
        err_path = path.replace("path_pose_dict", "path_error_dict")
        if err_path != path:
            np.save(err_path, err_rec, allow_pickle=True)
        return path

"""Offline reference-database builder: FPS / uniform view selection.

Equivalent of the reference's view sampler CLI
(src/datasets/utils/view_sampler.py:29-803): reads a dataset's training
split, selects N views per category by farthest-point-sampling the camera
centers (or uniformly), and materializes a ``real_train_{fps,uniform}_{N}``
sibling directory (symlinks by default) that the adapters pick up through
``reference_suffix='_fps_5'`` etc.

Usage:
    python -m boxdreamer_tpu.tools.view_sampler \
        --dataset LINEMOD --root data/lm --num 5 --method fps
"""

from __future__ import annotations

import argparse
import os
import shutil
from typing import List, Sequence

import numpy as np

from boxdreamer_tpu.data.sampling import farthest_point_sample_cameras
from boxdreamer_tpu.utils.log import INFO


def camera_centers_from_pose_files(pose_files: Sequence[str]) -> np.ndarray:
    centers = []
    for f in pose_files:
        pose = np.loadtxt(f)
        if pose.shape == (3, 4):
            pose = np.vstack([pose, [0, 0, 0, 1]])
        R, t = pose[:3, :3], pose[:3, 3]
        centers.append(-R.T @ t)
    return np.asarray(centers)


def select_views(
    pose_files: Sequence[str], num: int, method: str = "fps"
) -> np.ndarray:
    if method == "fps":
        centers = camera_centers_from_pose_files(pose_files)
        return farthest_point_sample_cameras(centers, num)
    if method == "uniform":
        n = len(pose_files)
        return np.linspace(0, n - 1, num=min(num, n)).astype(int)
    raise ValueError(f"unknown method {method}")


def angular_coverage(pose_files: Sequence[str], idxs: np.ndarray) -> float:
    """Mean pairwise angular spread of the selected viewing directions —
    the reference's YCBV best-sequence criterion (view_sampler.py:331-745)."""
    dirs = []
    for i in idxs:
        pose = np.loadtxt(pose_files[i])
        if pose.shape == (3, 4):
            pose = np.vstack([pose, [0, 0, 0, 1]])
        dirs.append(pose[2, :3])
    dirs = np.asarray(dirs)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    cos = np.clip(dirs @ dirs.T, -1, 1)
    ang = np.degrees(np.arccos(cos))
    n = len(idxs)
    return float(ang[np.triu_indices(n, 1)].mean()) if n > 1 else 0.0


def _frame_stems(cat_dir: str) -> List[str]:
    return sorted(
        {f.split("-")[0] for f in os.listdir(cat_dir) if f.endswith("-color.png")}
    )


def build_linemod_reference_db(
    root: str, num: int, method: str = "fps", link: bool = True
) -> str:
    """Build real_train_{method}_{num}/ for a LINEMOD-layout dataset."""
    src_root = os.path.join(root, "real_train")
    dst_root = os.path.join(root, f"real_train_{method}_{num}")
    os.makedirs(dst_root, exist_ok=True)
    for cat in sorted(os.listdir(src_root)):
        cat_dir = os.path.join(src_root, cat)
        if not os.path.isdir(cat_dir):
            continue
        stems = _frame_stems(cat_dir)
        pose_files = [os.path.join(cat_dir, s + "-pose.txt") for s in stems]
        idxs = select_views(pose_files, num, method)
        dst_cat = os.path.join(dst_root, cat)
        os.makedirs(dst_cat, exist_ok=True)
        for new_i, i in enumerate(sorted(idxs)):
            stem = stems[i]
            for f in os.listdir(cat_dir):
                if f.startswith(stem + "-"):
                    suffix = f[len(stem):]
                    dst = os.path.join(dst_cat, f"{new_i:04d}{suffix}")
                    src = os.path.join(cat_dir, f)
                    if os.path.lexists(dst):
                        os.remove(dst)
                    if link:
                        os.symlink(os.path.abspath(src), dst)
                    else:
                        shutil.copy(src, dst)
        INFO(
            f"{cat}: selected {len(idxs)} views "
            f"(coverage {angular_coverage(pose_files, idxs):.1f} deg)"
        )
    return dst_root


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Reference-DB view sampler")
    parser.add_argument("--dataset", default="LINEMOD")
    parser.add_argument("--root", required=True)
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--method", choices=["fps", "uniform"], default="fps")
    parser.add_argument("--copy", action="store_true", help="copy instead of symlink")
    args = parser.parse_args(argv)
    if args.dataset not in ("LINEMOD", "LINEMODO", "YCBV"):
        raise SystemExit(f"unsupported dataset layout: {args.dataset}")
    out = build_linemod_reference_db(
        args.root, args.num, args.method, link=not args.copy
    )
    INFO(f"reference DB written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

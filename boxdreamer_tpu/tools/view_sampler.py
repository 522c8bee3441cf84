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


def _rotations_from_pose_files(pose_files: Sequence[str]) -> np.ndarray:
    rots = []
    for f in pose_files:
        pose = np.loadtxt(f)
        rots.append(pose[:3, :3])
    return np.asarray(rots)


def average_angular_distance(pose_files: Sequence[str]) -> float:
    """Mean pairwise geodesic rotation angle (radians) over all frames — the
    reference's sequence-coverage score (view_sampler.py:331-360),
    vectorized (the reference double-loops over pairs)."""
    R = _rotations_from_pose_files(pose_files)
    n = len(R)
    if n < 2:
        return 0.0
    # trace(R_i^T R_j) for all pairs at once.
    tr = np.einsum("iab,jab->ij", R, R)
    tr = np.clip(tr, -1.0, 3.0)
    ang = np.arccos((tr - 1.0) / 2.0)
    return float(ang[np.triu_indices(n, 1)].mean())


def select_best_sequence(obj_dir: str):
    """Pick the sequence with the widest average angular coverage
    (reference select_best_sequence, view_sampler.py:382-421).

    Returns (best_seq_name, [(seq, score) ...] sorted descending)."""
    scores = {}
    for seq in sorted(os.listdir(obj_dir)):
        seq_dir = os.path.join(obj_dir, seq)
        if not os.path.isdir(seq_dir):
            continue
        pose_files = [
            os.path.join(seq_dir, f.split("-")[0] + "-pose.txt")
            for f in os.listdir(seq_dir)
            if f.endswith("-color.png")
        ]
        scores[seq] = average_angular_distance(pose_files) if pose_files else 0.0
    ranked = sorted(scores.items(), key=lambda kv: kv[1], reverse=True)
    best = ranked[0][0] if ranked else None
    return best, ranked


def build_onepose_reference_db(
    root: str,
    num: int,
    method: str = "fps",
    sub_dir: str = "test_data",
    link: bool = True,
) -> str:
    """Build ``<sub_dir>_{method}_{num}/`` for a OnePose-layout dataset
    (reference sample_onepose_reference_views, view_sampler.py:220-315):
    sequence ``<obj>-1`` is subsampled (color/intrin_ba/poses_ba/reproj_box);
    other sequences are symlinked whole; box3d_corners.txt is copied."""
    src_root = os.path.join(root, sub_dir)
    dst_root = os.path.join(root, f"{sub_dir}_{method}_{num}")
    if os.path.exists(dst_root):
        shutil.rmtree(dst_root)
    os.makedirs(dst_root)
    data_dirs = ["color", "intrin_ba", "poses_ba", "reproj_box"]
    suffixes = [".png", ".txt", ".txt", ".txt"]
    for obj in sorted(os.listdir(src_root)):
        obj_src = os.path.join(src_root, obj)
        if not os.path.isdir(obj_src):
            continue
        obj_dst = os.path.join(dst_root, obj)
        os.makedirs(obj_dst)
        for seq in sorted(os.listdir(obj_src)):
            src_seq = os.path.join(obj_src, seq)
            if seq == "box3d_corners.txt":
                shutil.copyfile(src_seq, os.path.join(obj_dst, seq))
                continue
            if not os.path.isdir(src_seq):
                continue
            seq_id = seq.split("-")[-1]
            if seq_id != "1":
                # Non-primary sequences stay whole (query pools).
                os.symlink(
                    os.path.abspath(src_seq),
                    os.path.join(obj_dst, seq),
                    target_is_directory=True,
                )
                continue
            dst_seq = os.path.join(obj_dst, seq)
            stems = sorted(
                (
                    int(f.split(".")[0])
                    for f in os.listdir(os.path.join(src_seq, "color"))
                    if f.split(".")[0].isdigit()
                ),
            )
            stems = [str(s) for s in stems]
            pose_files = [
                os.path.join(src_seq, "poses_ba", s + ".txt") for s in stems
            ]
            idxs = select_views(pose_files, num, method)
            for d, suf in zip(data_dirs, suffixes):
                os.makedirs(os.path.join(dst_seq, d), exist_ok=True)
            for i in sorted(idxs):
                for d, suf in zip(data_dirs, suffixes):
                    src_f = os.path.join(src_seq, d, stems[i] + suf)
                    dst_f = os.path.join(dst_seq, d, stems[i] + suf)
                    if not os.path.exists(src_f):
                        continue
                    if link:
                        os.symlink(os.path.abspath(src_f), dst_f)
                    else:
                        shutil.copyfile(src_f, dst_f)
            INFO(f"{obj}/{seq}: selected {len(idxs)} views")
    return dst_root


def build_ycbv_reference_db(
    root: str,
    num: int,
    method: str = "fps",
    sub_dir: str = "ref_views_16_processed",
    mode: str = "most-overlapping",
    pre_selected: dict | None = None,
    link: bool = True,
) -> str:
    """Build ``<sub_dir>_{method}_{num}/`` for a YCBV-layout dataset
    (reference sample_ycbv_reference_views, view_sampler.py:423-745): per
    object, pick ONE sequence — by angular-coverage score
    ('most-overlapping'), lexicographic 'first', or a 'pre-selected'
    mapping — then subsample its frames.

    Returns the target root; writes obj_seq_mapping.txt alongside."""
    src_root = os.path.join(root, sub_dir)
    dst_root = os.path.join(root, f"{sub_dir}_{method}_{num}")
    if os.path.exists(dst_root):
        shutil.rmtree(dst_root)
    os.makedirs(dst_root)
    mapping = {}
    for obj in sorted(os.listdir(src_root)):
        obj_src = os.path.join(src_root, obj)
        if not os.path.isdir(obj_src):
            continue
        if mode == "pre-selected" and pre_selected and obj in pre_selected:
            best_seq = pre_selected[obj]
        elif mode == "first":
            best_seq = sorted(os.listdir(obj_src))[0]
        else:
            best_seq, _ = select_best_sequence(obj_src)
        if best_seq is None:
            INFO(f"{obj}: no valid sequence, skipping")
            continue
        mapping[obj] = best_seq
        seq_src = os.path.join(obj_src, best_seq)
        seq_dst = os.path.join(dst_root, obj, best_seq)
        os.makedirs(seq_dst)
        stems = _frame_stems(seq_src)
        pose_files = [os.path.join(seq_src, s + "-pose.txt") for s in stems]
        idxs = select_views(pose_files, num, method)
        for i in sorted(idxs):
            for suf in ("-box.txt", "-color.png", "-pose.txt", "-intrinsics.txt"):
                src_f = os.path.join(seq_src, stems[i] + suf)
                if not os.path.exists(src_f):
                    continue
                dst_f = os.path.join(seq_dst, stems[i] + suf)
                if link:
                    os.symlink(os.path.abspath(src_f), dst_f)
                else:
                    shutil.copyfile(src_f, dst_f)
        INFO(f"{obj}: sequence {best_seq}, {len(idxs)} views")
    with open(os.path.join(dst_root, "obj_seq_mapping.txt"), "w") as f:
        for obj, seq in sorted(mapping.items()):
            f.write(f"{obj} {seq}\n")
    return dst_root


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Reference-DB view sampler")
    parser.add_argument("--dataset", default="LINEMOD")
    parser.add_argument("--root", required=True)
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--method", choices=["fps", "uniform"], default="fps")
    parser.add_argument("--sub-dir", default=None,
                        help="source subdir (OnePose: test_data; "
                             "YCBV: ref_views_16_processed)")
    parser.add_argument("--mode", default="most-overlapping",
                        choices=["most-overlapping", "first"],
                        help="YCBV sequence selection mode")
    parser.add_argument("--copy", action="store_true", help="copy instead of symlink")
    args = parser.parse_args(argv)
    link = not args.copy
    if args.dataset in ("LINEMOD", "LINEMODO"):
        out = build_linemod_reference_db(args.root, args.num, args.method, link=link)
    elif args.dataset in ("ONEPOSE", "ONEPOSE_LOWTEXTURE"):
        out = build_onepose_reference_db(
            args.root, args.num, args.method,
            sub_dir=args.sub_dir or "test_data", link=link,
        )
    elif args.dataset == "YCBV":
        out = build_ycbv_reference_db(
            args.root, args.num, args.method,
            sub_dir=args.sub_dir or "ref_views_16_processed",
            mode=args.mode, link=link,
        )
    else:
        raise SystemExit(f"unsupported dataset layout: {args.dataset}")
    INFO(f"reference DB written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

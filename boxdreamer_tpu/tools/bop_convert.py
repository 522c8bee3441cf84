"""BOP-format dataset converter (YCBV/LINEMOD BOP releases -> framework layout).

Equivalent of the reference's dataset prep scripts
(src/datasets/utils/ycbv/ycbv_process.py:1-266 and linemod_utils/
linemod_o_process.py): reads the standard BOP layout

    <bop_root>/<split>/<scene>/rgb/<im>.png
                          scene_gt.json        {im: [{obj_id, cam_R_m2c, cam_t_m2c}]}
                          scene_camera.json    {im: {cam_K}}
                          scene_gt_info.json   {im: [{bbox_visib}]}

and writes the per-frame txt layout the adapters consume
(``<out>/<split>/obj_<id>/<scene>_<im>-color.png`` + -pose/-intrinsics/-box
sidecars; translations converted mm -> m).

Usage:
    python -m boxdreamer_tpu.tools.bop_convert --bop-root data/ycbv_bop \
        --split test --output data/ycbv
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Dict, Optional, Sequence

import numpy as np

from boxdreamer_tpu.utils.log import INFO


def convert_scene(
    scene_dir: str,
    out_split_dir: str,
    obj_filter: Optional[Sequence[int]] = None,
    link: bool = True,
) -> int:
    scene = os.path.basename(scene_dir.rstrip("/"))
    with open(os.path.join(scene_dir, "scene_gt.json")) as f:
        scene_gt = json.load(f)
    with open(os.path.join(scene_dir, "scene_camera.json")) as f:
        scene_cam = json.load(f)
    info_path = os.path.join(scene_dir, "scene_gt_info.json")
    scene_info = {}
    if os.path.exists(info_path):
        with open(info_path) as f:
            scene_info = json.load(f)

    n = 0
    for im_id, gt_list in scene_gt.items():
        rgb = os.path.join(scene_dir, "rgb", f"{int(im_id):06d}.png")
        if not os.path.exists(rgb):
            rgb = os.path.join(scene_dir, "rgb", f"{int(im_id):06d}.jpg")
            if not os.path.exists(rgb):
                continue
        K = np.asarray(scene_cam[im_id]["cam_K"], dtype=np.float64).reshape(3, 3)
        infos = scene_info.get(im_id, [{}] * len(gt_list))
        for gt_idx, gt in enumerate(gt_list):
            obj_id = int(gt["obj_id"])
            if obj_filter and obj_id not in obj_filter:
                continue
            pose = np.eye(4)
            pose[:3, :3] = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
            pose[:3, 3] = np.asarray(gt["cam_t_m2c"], np.float64) / 1000.0  # mm->m
            # Nest per scene: the reference YCBV loader requires
            # <split>/<obj>/<seq>/ sequence directories (ycbv.py:168-196)
            # and merges sequences per object at load.
            obj_dir = os.path.join(out_split_dir, f"obj_{obj_id:06d}", scene)
            os.makedirs(obj_dir, exist_ok=True)
            base = os.path.join(obj_dir, f"{int(im_id):06d}")
            ext = os.path.splitext(rgb)[1]
            dst = base + "-color.png" if ext == ".png" else base + "-color" + ext
            if not os.path.lexists(dst):
                if link:
                    os.symlink(os.path.abspath(rgb), dst)
                else:
                    shutil.copy(rgb, dst)
            np.savetxt(base + "-pose.txt", pose)
            np.savetxt(base + "-intrinsics.txt", K)
            box = infos[gt_idx].get("bbox_visib") if gt_idx < len(infos) else None
            if box is not None:
                x, y, w, h = box
                np.savetxt(base + "-box.txt", np.array([x, y, x + w, y + h]))
            else:
                np.savetxt(base + "-box.txt", np.array([0, 0, 1, 1]))
            n += 1
    return n


def convert_models(bop_root: str, out_root: str, link: bool = True) -> int:
    """BOP models/ (obj_NNNNNN.ply, mm units) -> models/obj_NNNNNN/...ply.
    Note BOP PLYs are in millimeters; adapters using t_scale='m' should pair
    them with the converter's mm->m pose scaling via model rescale at metric
    time (reference point_cloud_rescale config)."""
    src = os.path.join(bop_root, "models")
    if not os.path.isdir(src):
        return 0
    n = 0
    for f in sorted(os.listdir(src)):
        if not f.endswith(".ply"):
            continue
        name = os.path.splitext(f)[0]
        dst_dir = os.path.join(out_root, "models", name)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, f)
        if not os.path.lexists(dst):
            if link:
                os.symlink(os.path.abspath(os.path.join(src, f)), dst)
            else:
                shutil.copy(os.path.join(src, f), dst)
        n += 1
    return n


# LINEMOD object-id -> name table (reference linemod_o_process.py:18-33).
LM_OB_ID_TO_NAMES: Dict[int, str] = {
    1: "ape", 2: "benchvise", 3: "bowl", 4: "camera", 5: "water_pour",
    6: "cat", 7: "cup", 8: "driller", 9: "duck", 10: "eggbox", 11: "glue",
    12: "holepuncher", 13: "iron", 14: "lamp", 15: "phone",
}


def convert_lmo(
    root: str,
    scene: str = "000002",
    out_dir: Optional[str] = None,
    link: bool = True,
) -> str:
    """LINEMOD-Occlusion preprocessing (reference linemod_o_process.py:1-91):
    split BOP scene 000002's per-frame multi-object annotations into
    per-object-NAME directories (``test-preprocessed/<name>/NNNNNN-color.png``
    + -pose.txt + -box.txt), translations mm -> m, boxes from ``bbox_obj``
    (the full object box — the reference uses it, not bbox_visib)."""
    scene_dir = os.path.join(root, "test", scene)
    with open(os.path.join(scene_dir, "scene_gt.json")) as f:
        scene_gt = json.load(f)
    with open(os.path.join(scene_dir, "scene_gt_info.json")) as f:
        scene_info = json.load(f)
    out_dir = out_dir or os.path.join(root, "test-preprocessed")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for im_id, gt_list in scene_gt.items():
        rgb = os.path.join(scene_dir, "rgb", f"{int(im_id):06d}.png")
        if not os.path.exists(rgb):
            continue
        for gt_idx, gt in enumerate(gt_list):
            name = LM_OB_ID_TO_NAMES[int(gt["obj_id"])]
            obj_dir = os.path.join(out_dir, name)
            os.makedirs(obj_dir, exist_ok=True)
            base = os.path.join(obj_dir, f"{int(im_id):06d}")
            pose = np.eye(4)
            pose[:3, :3] = np.asarray(gt["cam_R_m2c"], np.float64).reshape(3, 3)
            pose[:3, 3] = np.asarray(gt["cam_t_m2c"], np.float64) / 1000.0
            np.savetxt(base + "-pose.txt", pose[:3])
            box = scene_info[im_id][gt_idx]["bbox_obj"]  # [x, y, w, h]
            with open(base + "-box.txt", "w") as f:
                f.write(f"{box[0]}\n{box[1]}\n{box[2]}\n{box[3]}\n")
            dst = base + "-color.png"
            if not os.path.lexists(dst):
                if link:
                    os.symlink(os.path.abspath(rgb), dst)
                else:
                    shutil.copy(rgb, dst)
    return out_dir


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Convert BOP dataset layout")
    parser.add_argument("--bop-root", required=True)
    parser.add_argument("--split", default="test", help="BOP split dir name")
    parser.add_argument("--output", required=True)
    parser.add_argument("--out-split", default=None,
                        help="output split name (default: same as --split)")
    parser.add_argument("--objects", type=int, nargs="*", default=None)
    parser.add_argument("--copy", action="store_true")
    parser.add_argument("--lmo", action="store_true",
                        help="LINEMOD-Occlusion mode (linemod_o_process.py "
                             "semantics: obj-name dirs, bbox_obj boxes)")
    parser.add_argument("--scene", default="000002", help="scene id for --lmo")
    args = parser.parse_args(argv)

    if args.lmo:
        out = convert_lmo(
            args.bop_root, scene=args.scene,
            out_dir=os.path.join(args.output, "test-preprocessed"),
            link=not args.copy,
        )
        INFO(f"LMO preprocessed -> {out}")
        return 0

    split_dir = os.path.join(args.bop_root, args.split)
    out_split = os.path.join(args.output, args.out_split or args.split)
    total = 0
    for scene in sorted(os.listdir(split_dir)):
        sd = os.path.join(split_dir, scene)
        if os.path.isdir(sd) and os.path.exists(os.path.join(sd, "scene_gt.json")):
            total += convert_scene(sd, out_split, args.objects, link=not args.copy)
    n_models = convert_models(args.bop_root, args.output, link=not args.copy)
    INFO(f"converted {total} annotations, {n_models} models -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

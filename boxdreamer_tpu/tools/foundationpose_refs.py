"""FoundationPose reference-database converter for YCB-Video.

Equivalent of the reference's FoundationPose ref processor
(src/datasets/utils/ycbv/foundationpose_ref_process.py): FoundationPose
ships 16 posed reference RGB-D views per YCBV object as

    <fp_root>/<obj_name>/rgb/<n>.png      (color)
    <fp_root>/<obj_name>/cam_in_ob/<n>.txt (object->camera or cam-in-object 4x4)
    <fp_root>/<obj_name>/K.txt             (3x3 intrinsics)

This tool rewrites them into the YCBV adapter's reference layout
``<out>/train<suffix>/<obj>/<n>-color.png`` with -pose/-intrinsics/-box
sidecars, so evaluation can use ``reference_suffix='_foundationpose'``
(the README's YCBV protocol).
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
from typing import Optional

import numpy as np

from boxdreamer_tpu.utils.log import INFO


def convert_object(
    obj_dir: str, out_dir: str, invert_poses: bool = True, link: bool = True
) -> int:
    rgbs = sorted(
        glob.glob(os.path.join(obj_dir, "rgb", "*.png"))
        + glob.glob(os.path.join(obj_dir, "rgb", "*.jpg"))
    )
    K_path = os.path.join(obj_dir, "K.txt")
    K = np.loadtxt(K_path) if os.path.exists(K_path) else None
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, rgb in enumerate(rgbs):
        stem = os.path.splitext(os.path.basename(rgb))[0]
        pose_path = os.path.join(obj_dir, "cam_in_ob", stem + ".txt")
        if not os.path.exists(pose_path):
            continue
        cam_in_ob = np.loadtxt(pose_path).reshape(4, 4)
        # FoundationPose stores camera-in-object; the pipeline wants
        # world(object)->camera.
        pose = np.linalg.inv(cam_in_ob) if invert_poses else cam_in_ob
        base = os.path.join(out_dir, f"{i:04d}")
        dst = base + "-color.png"
        if not os.path.lexists(dst):
            if link:
                os.symlink(os.path.abspath(rgb), dst)
            else:
                shutil.copy(rgb, dst)
        np.savetxt(base + "-pose.txt", pose)
        if K is not None:
            np.savetxt(base + "-intrinsics.txt", K.reshape(3, 3))
        # Full-frame box placeholder; the projected-3D-box refinement in the
        # base dataset replaces it (base.py crop chain).
        from PIL import Image

        w, h = Image.open(rgb).size
        np.savetxt(base + "-box.txt", np.array([0, 0, w, h]))
        n += 1
    return n


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="FoundationPose refs -> YCBV reference DB"
    )
    parser.add_argument("--fp-root", required=True)
    parser.add_argument("--output", required=True, help="YCBV dataset root")
    parser.add_argument("--suffix", default="_foundationpose")
    parser.add_argument("--no-invert", action="store_true",
                        help="poses are already object->camera")
    parser.add_argument("--copy", action="store_true")
    args = parser.parse_args(argv)
    out_root = os.path.join(args.output, "train" + args.suffix)
    total = 0
    for obj in sorted(os.listdir(args.fp_root)):
        d = os.path.join(args.fp_root, obj)
        if not os.path.isdir(d):
            continue
        total += convert_object(
            d,
            os.path.join(out_root, obj),
            invert_poses=not args.no_invert,
            link=not args.copy,
        )
    INFO(f"converted {total} reference views -> {out_root}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

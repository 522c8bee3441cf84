"""Qualitative result compositor CLI.

Equivalent of the reference's scripts/tools/vis_results.py (817 LoC result
visualizer): renders pred-vs-GT 3D-box overlays for an evaluated dataset
and composes them into comparison sheets.

Usage:
    python -m boxdreamer_tpu.tools.vis_results --dataset LINEMOD \
        --root data/lm --poses path_pose_dict.npy --output vis/
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from boxdreamer_tpu.utils import vis
from boxdreamer_tpu.utils.log import INFO


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Compose qualitative results")
    parser.add_argument("--dataset", default="LINEMOD")
    parser.add_argument("--root", required=True)
    parser.add_argument(
        "--poses", required=True,
        help="npy of {image_path: pred_pose} (Evaluator/metrics dump format)",
    )
    parser.add_argument("--output", default="vis_results")
    parser.add_argument("--max-images", type=int, default=32)
    parser.add_argument("--sheet-cols", type=int, default=4)
    parser.add_argument(
        "--mode", default="boxes", choices=["boxes", "frames"],
        help="boxes: pred-vs-GT overlays + sheets; frames: per-query "
             "composite panels (reference process_video_frames layout: "
             "reference-image grid beside the labeled query overlay)",
    )
    parser.add_argument(
        "--errors", default=None,
        help="optional npy of {image_path: {metric: value}} (path_error_dict) "
             "stamped onto frame panels",
    )
    parser.add_argument(
        "--frustums", action="store_true",
        help="also write a per-category 3D camera-frustum plot (GT green / "
             "pred red)",
    )
    args = parser.parse_args(argv)

    from PIL import Image

    from boxdreamer_tpu.data import DatasetConfig, build_dataset
    from boxdreamer_tpu.utils import vis_panels

    pose_dict = np.load(args.poses, allow_pickle=True).item()
    err_dict = (
        np.load(args.errors, allow_pickle=True).item() if args.errors else {}
    )
    cfg = DatasetConfig(image_size=224, length=2)
    ds = build_dataset(args.dataset, cfg, "test", root=args.root)
    os.makedirs(args.output, exist_ok=True)

    panels = []
    count = 0
    for cat in ds.cat_len["test"]:
        bbox_3d = ds.get_bbox3d(cat)
        if bbox_3d is None:
            continue
        cat_gt, cat_pred = [], []
        ref_paths = ds.images.get("ref", {}).get(cat, [])[:9]
        ref_imgs = [np.asarray(ds.read_image(p)) for p in ref_paths]
        for i, img_path in enumerate(ds.images["test"][cat]):
            entry = pose_dict.get(img_path)
            if entry is None and isinstance(pose_dict.get(cat), dict):
                entry = pose_dict[cat].get(img_path)
            if entry is None or count >= args.max_images:
                continue
            pred = np.asarray(entry).reshape(4, 4)
            gt = ds.read_pose(ds.poses["test"][cat][i])
            K = ds.read_intrinsics(ds.intrinsics["test"][cat][i])
            img = ds.read_image(img_path)
            overlay = vis.compare_boxes(img, K, pred, gt, bbox_3d)
            if args.mode == "frames":
                frame = vis_panels.compose_query_panel(
                    np.asarray(overlay),
                    ref_imgs,
                    metrics=err_dict.get(img_path),
                )
                panel = Image.fromarray(frame)
            else:
                panel = overlay
            panel.save(os.path.join(args.output, f"{cat}_{i:04d}.png"))
            panels.append(panel)
            cat_gt.append(gt)
            cat_pred.append(pred)
            count += 1
        if args.frustums and cat_gt:
            vis.plot_cameras(
                np.stack(cat_gt),
                np.stack(cat_pred),
                path=os.path.join(args.output, f"{cat}_frustums.png"),
            )

    # Comparison sheets.
    cols = args.sheet_cols
    for s in range(0, len(panels), cols * cols):
        sheet_panels = panels[s : s + cols * cols]
        rows = [
            vis.hstack_images(sheet_panels[r : r + cols])
            for r in range(0, len(sheet_panels), cols)
        ]
        if rows:
            widths = max(r.width for r in rows)
            total_h = sum(r.height for r in rows)
            sheet = Image.new("RGB", (widths, total_h), (30, 30, 30))
            y = 0
            for r in rows:
                sheet.paste(r, (0, y))
                y += r.height
            sheet.save(os.path.join(args.output, f"sheet_{s // (cols*cols):02d}.png"))
    INFO(f"wrote {count} panels to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

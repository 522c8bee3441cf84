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
    args = parser.parse_args(argv)

    from PIL import Image

    from boxdreamer_tpu.data import DatasetConfig, build_dataset

    pose_dict = np.load(args.poses, allow_pickle=True).item()
    cfg = DatasetConfig(image_size=224, length=2)
    ds = build_dataset(args.dataset, cfg, "test", root=args.root)
    os.makedirs(args.output, exist_ok=True)

    panels = []
    count = 0
    for cat in ds.cat_len["test"]:
        bbox_3d = ds.get_bbox3d(cat)
        if bbox_3d is None:
            continue
        for i, img_path in enumerate(ds.images["test"][cat]):
            entry = pose_dict.get(img_path) or (
                pose_dict.get(cat, {}).get(img_path)
                if isinstance(pose_dict.get(cat), dict)
                else None
            )
            if entry is None or count >= args.max_images:
                continue
            pred = np.asarray(entry).reshape(4, 4)
            gt = ds.read_pose(ds.poses["test"][cat][i])
            K = ds.read_intrinsics(ds.intrinsics["test"][cat][i])
            img = ds.read_image(img_path)
            panel = vis.compare_boxes(img, K, pred, gt, bbox_3d)
            panel.save(os.path.join(args.output, f"{cat}_{i:04d}.png"))
            panels.append(panel)
            count += 1

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

"""Dataset pose-distribution statistics CLI.

Equivalent of the reference's src/utils/data_analyse.py:1-206: iterate a
dataset split, collect the query frame's rotation angle and translation,
and dump histograms + JSON stats. Improvements over the reference: works
with EVERY registered adapter (the reference hardcodes 3), takes --out
instead of a hardcoded home-directory dump path, and streams items without
a torch DataLoader (the stats read one pose per item; worker processes buy
nothing).

Usage:
    python -m boxdreamer_tpu.tools.data_analyse \
        --dataset LINEMOD --root data/lm --split test --out stats/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def compute_angle(rotation_matrix: np.ndarray) -> float:
    """Geodesic rotation angle (radians) of a 3x3 rotation matrix."""
    trace = float(np.trace(rotation_matrix))
    return float(np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0)))


def analyse(dataset, max_items: int | None = None):
    """Collect per-item query-pose angle (deg) and translation arrays."""
    angles, translations = [], []
    n = len(dataset)
    if max_items is not None:
        n = min(n, max_items)
    for i in range(n):
        try:
            item = dataset.get_item(i)
            pose = np.asarray(item["poses"])[-1]  # query frame is last
            angles.append(np.rad2deg(compute_angle(pose[:3, :3])))
            translations.append(pose[:3, 3])
        except Exception as e:  # noqa: BLE001 — mirror the reference's skip
            print(f"Error processing item {i}: {e}", file=sys.stderr)
            continue
    return np.asarray(angles), np.asarray(translations)


def write_stats(angles: np.ndarray, translations: np.ndarray, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    angle_stats = {
        "count": int(angles.size),
        "min": float(angles.min()) if angles.size else None,
        "max": float(angles.max()) if angles.size else None,
        "mean": float(angles.mean()) if angles.size else None,
        "std": float(angles.std()) if angles.size else None,
    }
    with open(os.path.join(out_dir, "angles.json"), "w") as f:
        json.dump(angle_stats, f, indent=2)
    trans_stats = {
        "mean": translations.mean(axis=0).tolist() if translations.size else None,
        "std": translations.std(axis=0).tolist() if translations.size else None,
    }
    with open(os.path.join(out_dir, "translation.json"), "w") as f:
        json.dump(trans_stats, f, indent=2)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if angles.size:
            plt.hist(angles, bins=100)
            plt.title("Angle Distribution")
            plt.xlabel("Angle (degree)")
            plt.ylabel("Count")
            plt.savefig(os.path.join(out_dir, "angles.png"))
            plt.close()
    except Exception as e:  # matplotlib optional — stats JSON is the output
        print(f"histogram skipped: {e}", file=sys.stderr)
    return angle_stats, trans_stats


def main(argv=None):
    from boxdreamer_tpu.data.base import DatasetConfig
    from boxdreamer_tpu.data.registry import DATASET_REGISTRY, build_dataset

    parser = argparse.ArgumentParser(
        description="Analyze pose distributions of a dataset split."
    )
    parser.add_argument("--dataset", required=True,
                        choices=sorted(DATASET_REGISTRY))
    parser.add_argument("--root", required=True, help="dataset root dir")
    parser.add_argument("--split", default="train",
                        choices=["train", "val", "test"])
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--length", type=int, default=6)
    parser.add_argument("--stride", type=int, default=5)
    parser.add_argument("--coordinate", default="first_camera",
                        choices=["first_camera", "object"])
    parser.add_argument("--max_items", type=int, default=None)
    parser.add_argument("--out", default=None,
                        help="output dir (default: stats/<dataset>-...)")
    args = parser.parse_args(argv)

    cfg = DatasetConfig(
        image_size=args.image_size,
        length=args.length,
        stride=args.stride,
        sampling_strategy="stride",
        coordinate=args.coordinate,
        use_bbox=False,
        device_bbox_feat=True,  # stats never touch the heatmaps
    )
    dataset = build_dataset(args.dataset, cfg, args.split, root=args.root)
    out_dir = args.out or os.path.join(
        "stats",
        f"{args.dataset.lower()}-{args.coordinate}--{args.split}"
        f"--{args.length}--{args.stride}",
    )
    angles, translations = analyse(dataset, args.max_items)
    angle_stats, trans_stats = write_stats(angles, translations, out_dir)
    print("Angle distribution statistics:", json.dumps(angle_stats))
    print("Translation vector statistics:", json.dumps(trans_stats))


if __name__ == "__main__":
    main()

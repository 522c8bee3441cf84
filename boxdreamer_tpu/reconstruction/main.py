"""Reconstruction driver CLI.

Equivalent of the reference driver (src/reconstruction/main.py:112-324):
iterates a dataset object-by-object in reconstruction mode, accumulates the
reference frames, runs the chosen backend, and writes per-object PLY + 3D
box to ``<root>/models_<backend>_<numviews>/<obj>/``.

Usage:
    python -m boxdreamer_tpu.reconstruction.main \
        --dataset LINEMOD --root data/lm --backend carve --num-views 5
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.utils.log import INFO


def build_reconstructor(backend: str):
    if backend == "carve":
        from boxdreamer_tpu.reconstruction.carve import VisualHullReconstructor

        return VisualHullReconstructor()
    if backend == "dust3r":
        from boxdreamer_tpu.reconstruction.dust3r import DUSt3RReconstructor

        return DUSt3RReconstructor()
    if backend == "colmap":
        from boxdreamer_tpu.reconstruction.colmap import COLMAPReconstructor

        return COLMAPReconstructor()
    raise SystemExit(f"unknown backend {backend} (carve | dust3r | colmap)")


def reconstruct_dataset(
    dataset_name: str,
    root: str,
    backend: str = "carve",
    num_views: int = 5,
    image_size: int = 224,
    split: str = "train",
) -> str:
    cfg = DatasetConfig(
        image_size=image_size,
        length=num_views + 1,
        sampling_strategy="uniform",
    )
    ds = build_dataset(dataset_name, cfg, "test" if split == "test" else "test",
                       root=root)
    out_root = os.path.join(root, f"models_{backend}_{num_views}")

    for cat, n in ds.cat_len["ref"].items():
        recon = build_reconstructor(backend)
        # One uniform pass over the reference DB for this object.
        idxs = np.linspace(0, n - 1, num=min(num_views, n)).astype(int)
        images = [ds.read_image(ds.images["ref"][cat][i]) for i in idxs]
        poses = np.stack([ds.read_pose(ds.poses["ref"][cat][i]) for i in idxs])
        Ks = np.stack([ds.read_intrinsics(ds.intrinsics["ref"][cat][i]) for i in idxs])
        boxes = [
            ds.read_box(ds.boxes["ref"][cat][i], "ref")
            if ds.boxes["ref"][cat][i] is not None
            else None
            for i in idxs
        ]
        batch = ds.process_sequence(
            images,
            [ds.images["ref"][cat][i] for i in idxs],
            boxes,
            poses,
            Ks,
            cat,
            query_idx=len(idxs) - 1,
        )
        recon.set_processed_data(
            {
                "images": batch["images"],
                "image_masks": batch.get("image_masks"),
                "non_ndc_intrinsics": batch["non_ndc_intrinsics"],
                "poses": batch["poses"],
            }
        )
        out_ply = os.path.join(out_root, cat, f"{cat}.ply")
        result = recon.run(output_ply=out_ply)
        INFO(
            f"{cat}: {len(result['points'])} points -> {out_ply}; "
            f"box extent {np.ptp(result['bbox_3d'], axis=0)}"
        )
    return out_root


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Offline reference reconstruction")
    parser.add_argument("--dataset", default="LINEMOD")
    parser.add_argument("--root", required=True)
    parser.add_argument("--backend", default="carve")
    parser.add_argument("--num-views", type=int, default=5)
    parser.add_argument("--image-size", type=int, default=224)
    args = parser.parse_args(argv)
    out = reconstruct_dataset(
        args.dataset, args.root, args.backend, args.num_views, args.image_size
    )
    INFO(f"models written under {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

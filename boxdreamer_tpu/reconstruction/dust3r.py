"""DUSt3R reconstruction backend (external-model orchestration).

Equivalent of the reference DUSt3RReconstructor
(src/reconstruction/dust3r.py:49-455): writes reference crops to a cache
dir, builds the complete pair graph, runs DUSt3R inference, then a global
PointCloudOptimizer alignment with the GT poses and intrinsics preset
(dust3r.py:240-256), masks and fuses the per-view pointmaps, and hands the
colored cloud to the base pruning/export pipeline.

The dust3r package and its checkpoint are external (the reference vendors
it as an empty git submodule too); this class degrades to a clear
ImportError at construction when unavailable. Use VisualHullReconstructor
for a dependency-free backend.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from boxdreamer_tpu.reconstruction.base import BaseReconstructor


class DUSt3RReconstructor(BaseReconstructor):
    name = "dust3r"

    def __init__(
        self,
        checkpoint: str = "naver/DUSt3R_ViTLarge_BaseDecoder_512_dpt",
        image_size: int = 224,
        align_iters: int = 300,
        min_conf_thr: float = 3.0,
        device: str = "cpu",
        prune_std_ratio: float = 2.0,
    ):
        super().__init__(prune_std_ratio=prune_std_ratio)
        self.image_size = image_size
        self.align_iters = align_iters
        self.min_conf_thr = min_conf_thr
        self.device = device
        try:
            from dust3r.inference import inference  # noqa: F401
            from dust3r.model import AsymmetricCroCo3DStereo
        except ImportError as e:  # pragma: no cover - external dep
            raise ImportError(
                "DUSt3RReconstructor requires the external 'dust3r' package "
                "and checkpoint; use VisualHullReconstructor for a built-in "
                "backend"
            ) from e
        self._model = AsymmetricCroCo3DStereo.from_pretrained(checkpoint).to(device)

    def reconstruct(self):  # pragma: no cover - requires external weights
        import torch
        from dust3r.image_pairs import make_pairs
        from dust3r.inference import inference
        from dust3r.cloud_opt import GlobalAlignerMode, global_aligner
        from dust3r.utils.image import load_images

        # Stage crops for dust3r's loader contract (reference dumps to a
        # cache dir and calls load_images(size=224), dust3r.py:217-238).
        import os
        import tempfile

        from PIL import Image

        tmp = tempfile.mkdtemp(prefix="dust3r_refs_")
        paths = []
        for i, img in enumerate(self.images):
            arr = (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
            p = os.path.join(tmp, f"{i:04d}.png")
            Image.fromarray(arr).save(p)
            paths.append(p)
        imgs = load_images(paths, size=self.image_size)
        pairs = make_pairs(imgs, scene_graph="complete", symmetrize=True)
        out = inference(pairs, self._model, self.device, batch_size=8)

        scene = global_aligner(
            out, device=self.device, mode=GlobalAlignerMode.PointCloudOptimizer
        )
        # Preset known poses + intrinsics (reference dust3r.py:240-256).
        poses_c2w = torch.tensor(
            np.stack([np.linalg.inv(p) for p in self.gt_poses]), dtype=torch.float32
        )
        scene.preset_pose(poses_c2w)
        focals = [float(K[0, 0]) for K in self.intrinsics]
        scene.preset_focal(focals)
        scene.compute_global_alignment(
            init="known_poses", niter=self.align_iters, schedule="cosine", lr=0.01
        )

        pts3d = scene.get_pts3d()
        confs = scene.get_conf()
        all_pts, all_cols = [], []
        for i, (pts, conf) in enumerate(zip(pts3d, confs)):
            m = (conf > self.min_conf_thr).cpu().numpy().reshape(-1)
            p = pts.detach().cpu().numpy().reshape(-1, 3)[m]
            img = self.images[i]
            cols = (
                np.clip(img.transpose(1, 2, 0), 0, 1).reshape(-1, 3)[m] * 255.0
            )
            fg = None
            if self.masks[i] is not None:
                fg = np.asarray(self.masks[i]).reshape(-1)[m] > 0.5
                p, cols = p[fg], cols[fg]
            all_pts.append(p)
            all_cols.append(cols)
        self.points = np.concatenate(all_pts, axis=0)
        self.colors = np.concatenate(all_cols, axis=0)

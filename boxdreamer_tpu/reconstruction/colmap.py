"""COLMAP reconstruction backend: triangulate reference views with KNOWN
poses/intrinsics into a sparse object point cloud.

Equivalent of the reference COLMAPReconstructor (src/reconstruction/
colmap.py:14-600): write a COLMAP project with fixed GT cameras
(cameras.txt/images.txt + empty points3D.txt), register the same cameras in
the database, run feature extraction + exhaustive matching, then
``point_triangulator`` (poses stay fixed — only 3D points are estimated) and
export the model to PLY.

Differences from the reference: fits this repo's BaseReconstructor hook
(``reconstruct`` fills self.points/self.colors and run() handles pruning +
PLY/box export), the COLMAP CLI runner and the pycolmap module are
injectable so the control flow is unit-testable without either installed,
and image preprocessing reuses data/preprocess (mask composite + square crop
with 0.1 padding, reference colmap.py:133-163).
"""

from __future__ import annotations

import os
import shutil
import sqlite3
import subprocess
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from boxdreamer_tpu.data.ply import read_ply_points
from boxdreamer_tpu.data.preprocess import square_bbox
from boxdreamer_tpu.reconstruction.base import BaseReconstructor
from boxdreamer_tpu.utils.log import INFO, WARNING


def rotation_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> COLMAP quaternion (qw, qx, qy, qz)."""
    K = (
        np.array(
            [
                [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
                [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
                [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1],
                 R[0, 0] + R[1, 1] + R[2, 2]],
            ]
        )
        / 3.0
    )
    vals, vecs = np.linalg.eigh(K)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return q if q[0] >= 0 else -q


class COLMAPReconstructor(BaseReconstructor):
    name = "colmap"

    def __init__(
        self,
        cache_path: Optional[str] = None,
        colmap_executable: str = "colmap",
        use_gpu: bool = False,
        runner: Optional[Callable] = None,
        pycolmap_module=None,
        prune_std_ratio: float = 2.0,
    ):
        super().__init__(prune_std_ratio=prune_std_ratio)
        self.cache_path = cache_path or os.path.join("cache", "colmap_cache")
        self.colmap_executable = colmap_executable
        self.use_gpu = use_gpu
        self._run = runner or (
            lambda cmd: subprocess.run(cmd, check=True, capture_output=True)
        )
        self._pycolmap = pycolmap_module

    # ----------------------------------------------------------------- paths

    @property
    def project_path(self) -> str:
        return os.path.join(self.cache_path, "project")

    @property
    def image_dir(self) -> str:
        return os.path.join(self.project_path, "images")

    @property
    def sparse_path(self) -> str:
        return os.path.join(self.project_path, "sparse")

    @property
    def database_path(self) -> str:
        return os.path.join(self.project_path, "database.db")

    def _reinit_workspace(self):
        if os.path.exists(self.cache_path):
            shutil.rmtree(self.cache_path)
        os.makedirs(self.image_dir, exist_ok=True)
        os.makedirs(os.path.join(self.sparse_path, "0"), exist_ok=True)

    # ------------------------------------------------------------ image prep

    def _dump_images(self) -> List[str]:
        """Write ingested crops (or masked+cropped source images) to the
        COLMAP image dir (reference _prepare_before_run, colmap.py:105-174)."""
        paths = []
        for i, img in enumerate(self.images):
            if isinstance(img, np.ndarray):
                arr = img
                if arr.ndim == 3 and arr.shape[0] in (1, 3):
                    arr = np.transpose(arr, (1, 2, 0))
                pil = Image.fromarray(
                    (np.clip(arr, 0, 1) * 255).astype(np.uint8).squeeze()
                ).convert("RGB")
                mask = self.masks[i]
                if mask is not None:
                    m = np.asarray(mask).squeeze()
                    pil_m = Image.fromarray((np.clip(m, 0, 1) * 255).astype(np.uint8))
                    pil = Image.composite(
                        pil, Image.new("RGB", pil.size, (0, 0, 0)), pil_m
                    )
                    ys, xs = np.nonzero(m > 0.5)
                    if len(xs):
                        bbox = square_bbox(
                            np.array([xs.min(), ys.min(), xs.max(), ys.max()]),
                            padding=0.1,
                        )
                        pil = pil.crop(tuple(int(v) for v in bbox))
            else:
                pil = Image.open(img).convert("RGB")
            p = os.path.join(self.image_dir, f"image_{i:04d}.jpg")
            pil.save(p, quality=95)
            paths.append(p)
        return paths

    # --------------------------------------------------------------- project

    def _write_project(self, image_paths: Sequence[str]):
        """cameras.txt + images.txt with fixed GT poses; empty points3D.txt
        (reference _write_colmap_project, colmap.py:366-459). One CAMERA_ID
        per distinct intrinsic matrix."""
        cam_ids: Dict[tuple, int] = {}
        self.cameras: List[Dict] = []
        self.images_info: List[Dict] = []
        with Image.open(image_paths[0]) as im0:
            width, height = im0.size
        for K in self.intrinsics:
            key = tuple(np.asarray(K).flatten().tolist())
            if key not in cam_ids:
                cam_ids[key] = len(cam_ids) + 1
                self.cameras.append(
                    {
                        "camera_id": cam_ids[key],
                        "model": "PINHOLE",
                        "width": width,
                        "height": height,
                        "params": [K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                    }
                )
        sparse0 = os.path.join(self.sparse_path, "0")
        with open(os.path.join(self.project_path, "cameras.txt"), "w") as f:
            f.write("# CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS...\n")
            for c in self.cameras:
                f.write(
                    f"{c['camera_id']} {c['model']} {c['width']} {c['height']} "
                    + " ".join(str(p) for p in c["params"])
                    + "\n"
                )
        with open(os.path.join(self.project_path, "images.txt"), "w") as f:
            f.write("# IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
            for idx, (path, pose, K) in enumerate(
                zip(image_paths, self.gt_poses, self.intrinsics), start=1
            ):
                qvec = rotation_to_qvec(np.asarray(pose)[:3, :3])
                tvec = np.asarray(pose)[:3, 3]
                cam_id = cam_ids[tuple(np.asarray(K).flatten().tolist())]
                name = os.path.basename(path)
                self.images_info.append(
                    {
                        "image_id": idx,
                        "name": name,
                        "camera_id": cam_id,
                        "qvec": qvec.tolist(),
                        "tvec": tvec.tolist(),
                    }
                )
                f.write(
                    f"{idx} " + " ".join(str(v) for v in qvec) + " "
                    + " ".join(str(v) for v in tvec) + f" {cam_id} {name}\n\n"
                )
        for name in ("cameras.txt", "images.txt"):
            shutil.copyfile(
                os.path.join(self.project_path, name), os.path.join(sparse0, name)
            )
        open(os.path.join(sparse0, "points3D.txt"), "w").close()

    # -------------------------------------------------------------- database

    def _pycolmap_mod(self):
        if self._pycolmap is not None:
            return self._pycolmap
        try:
            import pycolmap  # noqa: PLC0415

            return pycolmap
        except ImportError as e:
            raise RuntimeError(
                "pycolmap is required for the colmap backend (or inject "
                "pycolmap_module for testing)"
            ) from e

    def _init_database(self):
        """database_creator + register cameras/images with known poses
        (reference _initialize_database, colmap.py:276-364)."""
        self._run(
            [
                self.colmap_executable,
                "database_creator",
                "--database_path",
                self.database_path,
            ]
        )
        pycolmap = self._pycolmap_mod()
        db = pycolmap.Database(self.database_path)
        for c in self.cameras:
            db.add_camera(
                pycolmap.Camera(
                    model=c["model"],
                    width=c["width"],
                    height=c["height"],
                    params=c["params"],
                )
            )
        for im in self.images_info:
            db.add_image(
                pycolmap.Image(
                    name=im["name"],
                    camera_id=im["camera_id"],
                    qvec=im["qvec"],
                    tvec=im["tvec"],
                )
            )
        db.commit()
        db.close()

    def _check_database(self, table: str):
        try:
            conn = sqlite3.connect(self.database_path)
            n = conn.execute(f"SELECT COUNT(*) FROM {table};").fetchone()[0]
            conn.close()
            INFO(f"colmap db: {table} has {n} entries")
        except Exception as e:  # db checks are diagnostics only
            WARNING(f"colmap db check failed for {table}: {e}")

    # ------------------------------------------------------------------ steps

    def _gpu_flag(self) -> str:
        return "1" if self.use_gpu else "0"

    def _extract_features(self):
        self._run(
            [
                self.colmap_executable,
                "feature_extractor",
                "--database_path",
                self.database_path,
                "--image_path",
                self.image_dir,
                "--SiftExtraction.use_gpu",
                self._gpu_flag(),
            ]
        )

    def _match_features(self):
        self._run(
            [
                self.colmap_executable,
                "exhaustive_matcher",
                "--database_path",
                self.database_path,
                "--SiftMatching.use_gpu",
                self._gpu_flag(),
            ]
        )

    def _triangulate(self):
        sparse0 = os.path.join(self.sparse_path, "0")
        self._run(
            [
                self.colmap_executable,
                "point_triangulator",
                "--database_path",
                self.database_path,
                "--image_path",
                self.image_dir,
                "--input_path",
                sparse0,
                "--output_path",
                sparse0,
            ]
        )

    def _export_ply(self) -> str:
        out = os.path.join(self.cache_path, "reconstruction.ply")
        self._run(
            [
                self.colmap_executable,
                "model_converter",
                "--input_path",
                os.path.join(self.sparse_path, "0"),
                "--output_path",
                out,
                "--output_type",
                "PLY",
            ]
        )
        return out

    # ------------------------------------------------------------ entrypoint

    def reconstruct(self):
        assert self.images, "no data ingested (set_processed_data first)"
        assert len(self.gt_poses) == len(self.intrinsics) == len(self.images)
        self._reinit_workspace()
        image_paths = self._dump_images()
        INFO(f"colmap: prepared {len(image_paths)} images")
        self._write_project(image_paths)
        self._init_database()
        self._extract_features()
        self._check_database("keypoints")
        self._match_features()
        self._check_database("matches")
        self._triangulate()
        ply = self._export_ply()
        self.points, self.colors = read_ply_points(ply)
        INFO(f"colmap: triangulated {len(self.points)} points")

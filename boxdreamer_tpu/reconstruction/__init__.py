"""Offline reference reconstruction (host-side preprocessing).

Equivalent of the reference's reconstruction layer (src/reconstruction/):
given posed reference crops of a novel object, produce a point cloud /
3D bounding box for the pose-estimation pipeline. Backends:

  * ``carve``  — built-in silhouette visual hull (pure numpy; no external
                 models needed; sufficient for the 3D box the pipeline
                 consumes),
  * ``dust3r`` — DUSt3R global-alignment reconstruction (requires the
                 external dust3r package + weights; orchestrated like
                 src/reconstruction/dust3r.py:49-455),
  * ``colmap`` — pycolmap-based SfM (requires pycolmap; like
                 src/reconstruction/colmap.py).
"""

from boxdreamer_tpu.reconstruction.base import BaseReconstructor
from boxdreamer_tpu.reconstruction.carve import VisualHullReconstructor

__all__ = ["BaseReconstructor", "VisualHullReconstructor"]

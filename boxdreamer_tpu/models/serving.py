"""Multi-object pose-tracking service.

Production serving layer over the cached-reference Predictor
(models/predictor.py): register any number of objects (each with its posed
reference crops and 3D box), then serve per-frame pose queries against any
of them with one jitted program. All objects share the same compiled
executable (shapes are fixed by num_refs/image size), so switching objects
is a device-array swap, not a recompile.

The reference has no serving layer (its demo tracks a single object in a
Python loop, src/demo/demo.py:1499-1612); this module is the deployment
surface the north star asks for.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.data import preprocess as pp
from boxdreamer_tpu.models.boxdreamer import BoxDreamer
from boxdreamer_tpu.models.predictor import Predictor
from boxdreamer_tpu.utils.profiling import FPSMeter


@dataclasses.dataclass
class ObjectEntry:
    tokens: jax.Array  # (1, N, P, C) cached encoder tokens
    fuse: jax.Array  # (1, N, P, d) cached fused decoder tokens
    bbox_feat: jax.Array  # (1, N, c, H, W)
    bbox_3d: jax.Array  # (1, 8, 3)


class PoseService:
    """Thread-safe multi-object pose service.

    Usage:
        svc = PoseService(model, params, num_refs=5)
        svc.register_object("mug", ref_images, ref_poses, ref_Ks)
        pose = svc.predict("mug", query_crop, K)
    """

    def __init__(self, model: BoxDreamer, params: Any, num_refs: int = 5):
        self.model = model
        self.num_refs = num_refs
        self._predictor = Predictor(model, params)
        self._objects: Dict[str, ObjectEntry] = {}
        self._lock = threading.Lock()
        self._fps = FPSMeter()

    # --------------------------------------------------------------- registry

    def register_object(
        self,
        obj_id: str,
        ref_images: np.ndarray,
        ref_poses: np.ndarray,
        ref_Ks: np.ndarray,
        bbox_3d: Optional[np.ndarray] = None,
    ) -> None:
        """Register an object from N posed reference crops.

        Args:
            ref_images: (N, 3, H, W) in [0, 1] (already cropped/resized).
            ref_poses: (N, 4, 4) world->camera; ref_Ks: (N, 3, 3) crop
                intrinsics; bbox_3d: (8, 3) corners — reconstructed via the
                visual hull from the references when omitted.
        """
        assert ref_images.shape[0] == self.num_refs, (
            f"expected {self.num_refs} references, got {ref_images.shape[0]}"
        )
        if bbox_3d is None:
            from boxdreamer_tpu.reconstruction.carve import VisualHullReconstructor

            recon = VisualHullReconstructor()
            recon.set_processed_data(
                {
                    "images": np.asarray(ref_images),
                    "non_ndc_intrinsics": np.asarray(ref_Ks),
                    "poses": np.asarray(ref_poses),
                }
            )
            bbox_3d = recon.run()["bbox_3d"]

        S = ref_images.shape[-1]
        proj = np.stack(
            [
                pp.project_points(ref_Ks[i], ref_poses[i], np.asarray(bbox_3d))
                for i in range(self.num_refs)
            ]
        )
        rep = self.model.config.bbox_representation
        bbox_feat = pp.make_bbox_features_np(proj, rep, S, S)

        self._predictor.set_references(
            jnp.asarray(ref_images)[None],
            jnp.asarray(bbox_feat)[None],
            jnp.asarray(np.asarray(bbox_3d))[None],
        )
        with self._lock:
            self._objects[obj_id] = ObjectEntry(
                tokens=self._predictor._refs["tokens"],
                fuse=self._predictor._refs["fuse"],
                bbox_feat=self._predictor._refs["bbox_feat"],
                bbox_3d=self._predictor._refs["bbox_3d"],
            )

    def objects(self) -> List[str]:
        with self._lock:
            return list(self._objects)

    def unregister_object(self, obj_id: str) -> None:
        with self._lock:
            self._objects.pop(obj_id, None)

    # ---------------------------------------------------------------- serving

    def predict(
        self, obj_id: str, query_image: np.ndarray, K: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """Pose of `obj_id` in a (3, H, W) query crop with (3, 3) intrinsics.

        Returns dict with 'pose' (4, 4), 'keypoints' (8, 2), 'fps'.
        """
        with self._lock:
            entry = self._objects[obj_id]
        self._predictor._refs = {
            "tokens": entry.tokens,
            "fuse": entry.fuse,
            "bbox_feat": entry.bbox_feat,
            "bbox_3d": entry.bbox_3d,
        }
        out = self._predictor.predict(
            jnp.asarray(query_image)[None], jnp.asarray(K)[None]
        )
        fps = self._fps.tick()
        return {
            "pose": np.asarray(out["pred_poses"][0]),
            "keypoints": np.asarray(out["pred_kpts_2d"][0]),
            "fps": fps,
        }

    def predict_batch(
        self, obj_id: str, query_images: np.ndarray, Ks: np.ndarray
    ) -> np.ndarray:
        """Batched queries (B, 3, H, W) against one object -> (B, 4, 4)."""
        with self._lock:
            entry = self._objects[obj_id]
        B = query_images.shape[0]
        refs = {
            "tokens": jnp.broadcast_to(
                entry.tokens, (B,) + entry.tokens.shape[1:]
            ),
            "fuse": jnp.broadcast_to(entry.fuse, (B,) + entry.fuse.shape[1:]),
            "bbox_feat": jnp.broadcast_to(
                entry.bbox_feat, (B,) + entry.bbox_feat.shape[1:]
            ),
            "bbox_3d": jnp.broadcast_to(entry.bbox_3d, (B, 8, 3)),
        }
        self._predictor._refs = refs
        out = self._predictor.predict(jnp.asarray(query_images), jnp.asarray(Ks))
        return np.asarray(out["pred_poses"])

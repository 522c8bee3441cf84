"""Model-config validation.

Equivalent of the reference's config validation layer
(src/models/utils/config_utils.py:10-96): checks representation combos,
encoder/patch-size compatibility, and computes the vector-pose camera
dimension. Operates on BoxDreamerConfig dataclasses instead of raw dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from boxdreamer_tpu.models.boxdreamer import BoxDreamerConfig
from boxdreamer_tpu.models.camera_repr import camera_vector_dim, rotation_length
from boxdreamer_tpu.utils.log import WARNING

VALID_POSE_REPRESENTATIONS = ("bb8", "plucker", "vector")
VALID_BBOX_REPRESENTATIONS = ("heatmap", "voting", "conf_voting", "cornernet")
VALID_COORDINATES = ("object", "first_camera")
VALID_ROTATION_TYPES = ("quat", "6d", "euler", "so3", "ray")


def validate_model_config(cfg: BoxDreamerConfig) -> BoxDreamerConfig:
    """Validate + normalize a model config (reference validate_model_config).

    Returns a possibly-modified copy; raises on invalid combinations.
    """
    assert cfg.pose_representation in VALID_POSE_REPRESENTATIONS, (
        f"invalid pose_representation {cfg.pose_representation}"
    )
    assert cfg.bbox_representation in VALID_BBOX_REPRESENTATIONS, (
        f"invalid bbox_representation {cfg.bbox_representation}"
    )
    assert cfg.coordinate in VALID_COORDINATES, f"invalid coordinate {cfg.coordinate}"

    # Cornernet decodes exactly like heatmap (reference :26-28 folds it in).
    if cfg.bbox_representation == "cornernet":
        cfg = dataclasses.replace(cfg, bbox_representation="heatmap")

    # Encoder / patch-size compatibility (reference :33-38).
    if cfg.encoder == "dino":
        assert cfg.betr.patch_size == 14, "DINOv2 only supports patch size 14"

    # bb8 + first_camera is geometrically inconsistent (object-frame corners
    # projected with camera-relative poses); the reference runs bb8 with
    # object coordinates only.
    if cfg.pose_representation == "bb8" and cfg.coordinate == "first_camera":
        WARNING(
            "bb8 with first_camera coordinates is geometrically inconsistent; "
            "use coordinate='object'"
        )
    return cfg


def setup_camera_params(
    rotation_type: str | None, regression_intri: bool = True, use_pp: bool = True
) -> Tuple[int, int]:
    """(camera_dim, rotation_length) for the vector pose representation
    (reference setup_camera_params, config_utils.py:47-96)."""
    if rotation_type is None:
        return 0, 0
    assert rotation_type in VALID_ROTATION_TYPES
    if rotation_type in ("quat", "6d"):
        rlen = rotation_length(rotation_type)
    else:
        rlen = 3  # euler / so3 axis-angle
    if rotation_type == "ray":
        return 0, 0
    if regression_intri:
        return rlen + 3 + 1 + (2 if use_pp else 0), rlen
    return rlen + 3, rlen

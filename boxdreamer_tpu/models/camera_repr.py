"""Camera representation helpers for the model layer.

Equivalent of the reference's camera_processing module
(src/models/utils/camera_processing.py:8-156) plus the vector-pose encoding
from pose_utils — batched JAX, no PyTorch3D camera objects and no Python
loops over (B, T).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from boxdreamer_tpu.ops import camera as camera_ops
from boxdreamer_tpu.ops import rays as rays_ops
from boxdreamer_tpu.ops import rotation as rot_ops


def make_camera_rays(
    poses: jax.Array,
    K: jax.Array,
    image_size: int,
    patch_size: int,
    crop_params: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-patch Plücker rays for every frame (reference make_camera_rays,
    camera_processing.py:8-54; the reference passes crop_parameters=None to
    cameras_to_rays, reproduced here by default).

    Args:
        poses: (B, T, 4, 4) OpenCV; K: (B, T, 3, 3) pixel intrinsics for the
        image_size crop.

    Returns:
        (B, T, 6, g, g) spatial Plücker rays with g = image_size//patch_size.
    """
    B, T = poses.shape[:2]
    g = image_size // patch_size
    size = jnp.array([image_size, image_size], dtype=jnp.float32)
    fl_px = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    pp_px = K[..., :2, 2]
    fl_ndc, pp_ndc = camera_ops.pixels_to_ndc(fl_px, pp_px, size)
    flat_poses = poses.reshape(B * T, 4, 4)
    flat_fl = fl_ndc.reshape(B * T, 2)
    flat_pp = pp_ndc.reshape(B * T, 2)
    flat_crop = crop_params.reshape(B * T, 4) if crop_params is not None else None
    pl = rays_ops.cameras_to_rays(flat_poses, flat_fl, flat_pp, flat_crop, g, g)
    return rays_ops.rays_to_spatial(pl, g).reshape(B, T, 6, g, g)


def recover_pose_from_rays(
    rays_spatial: jax.Array,
    K: jax.Array,
    image_size: int,
    coordinate: str = "object",
    crop_params: Optional[jax.Array] = None,
) -> jax.Array:
    """Recover poses from predicted spatial rays (reference
    recover_pose_from_rays, camera_processing.py:57-116).

    NOTE: the reference passes ``cameras`` positionally into
    rays_to_cameras' ``use_half_pix`` slot (camera_processing.py:84), so it
    actually aligns against the DEFAULT-focal (3.453) ray pattern instead
    of the real intrinsics. We use the real intrinsics (the intended
    algorithm; ~2x lower recovery error). Pinned by
    tests/parity/test_rays_golden.py::test_reference_recover_uses_default_focal_quirk.

    Args:
        rays_spatial: (B, T, 6, g, g); K: (B, T, 3, 3).

    Returns:
        (B, T, 4, 4) poses; first_camera coordinates re-apply the relative
        transform as in the reference (:109-115).
    """
    B, T = rays_spatial.shape[:2]
    g = rays_spatial.shape[-1]
    size = jnp.array([image_size, image_size], dtype=jnp.float32)
    fl_px = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)
    pp_px = K[..., :2, 2]
    fl_ndc, pp_ndc = camera_ops.pixels_to_ndc(fl_px, pp_px, size)
    pl = rays_ops.rays_from_spatial(rays_spatial.reshape(B * T, 6, g, g))
    flat_crop = crop_params.reshape(B * T, 4) if crop_params is not None else None
    poses = rays_ops.rays_to_cameras(
        pl, flat_crop, fl_ndc.reshape(B * T, 2), pp_ndc.reshape(B * T, 2), g, g
    ).reshape(B, T, 4, 4)
    if coordinate == "first_camera":
        inv0 = camera_ops.invert_pose(poses[:, 0])
        poses = jnp.einsum("btij,bjk->btik", poses, inv0)
    return poses


def make_rotation_representation(R: jax.Array, rotation_type: str) -> jax.Array:
    """Rotation encoding (reference pose_utils.make_rotation_representation):
    'quat' -> (…, 4), '6d' -> (…, 6)."""
    if rotation_type == "quat":
        return rot_ops.matrix_to_quat(R)
    if rotation_type == "6d":
        return rot_ops.matrix_to_sixd(R)
    raise NotImplementedError(f"rotation_type {rotation_type}")


def rotation_length(rotation_type: str) -> int:
    return {"quat": 4, "6d": 6}[rotation_type]


def camera_vector_dim(rotation_type: str, use_pp: bool) -> int:
    """Vector size: rotation + t(3) + f(1) [+ pp(2)]
    (reference config_utils.setup_camera_params, config_utils.py:60-96)."""
    return rotation_length(rotation_type) + 3 + 1 + (2 if use_pp else 0)


def encode_camera_as_vector(
    poses: jax.Array, K: jax.Array, rotation_type: str, use_pp: bool = True
) -> jax.Array:
    """Vector pose encoding [rot_rep, t, fx, (cx, cy)]
    (reference encode_camera_as_vector, camera_processing.py:119-156),
    vectorized over (B, T).

    Returns:
        (B, T, camera_dim).
    """
    r_rep = make_rotation_representation(poses[..., :3, :3], rotation_type)
    parts = [r_rep, poses[..., :3, 3], K[..., 0, 0][..., None]]
    if use_pp:
        parts.append(K[..., :2, 2])
    return jnp.concatenate(parts, axis=-1)


def safe_inverse(pose: jax.Array) -> jax.Array:
    """Rigid-pose inverse (reference camera_utils.safe_inverse) — analytic,
    no linear solve."""
    return camera_ops.invert_pose(pose)

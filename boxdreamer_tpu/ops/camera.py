"""Camera math: projection, NDC conversions, crop-driven intrinsics adjustment.

Pure-JAX, batched equivalents of the reference's camera utilities
(reference: src/datasets/utils/base/camera_utils.py:9-85,
src/utils/camera_transform.py:26-89, src/datasets/utils/preprocess.py:22-300).
The reference round-trips through PyTorch3D `PerspectiveCameras` objects and
per-item Python loops; here everything is closed-form matrix math with leading
batch dimensions, so the whole preprocessing chain can live inside one jitted
program (or run as vectorized numpy on the host loader).

Conventions
-----------
* Poses are world->camera (OpenCV convention): ``x_cam = R @ x_world + t``,
  stored as 4x4 row-major matrices.
* Intrinsics ``K`` are 3x3 with ``fx, fy`` on the diagonal and the principal
  point in the last column.
* "NDC" follows the reference's PyTorch3D-style screen NDC: for an image of
  size ``(W, H)``, ``f_ndc = f_px / (size/2)`` and
  ``pp_ndc = (size/2 - pp_px) / (size/2)`` per axis
  (reference: src/utils/camera_transform.py:68-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boxdreamer_tpu.utils.precision import highp


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------


@highp
def project_points(pts_3d: jax.Array, K: jax.Array, pose: jax.Array) -> jax.Array:
    """Project 3D points into pixel coordinates.

    Batched equivalent of the reference's ``reproj_pytorch``
    (src/datasets/utils/base/camera_utils.py:9-59) without the per-sample loop.

    Args:
        pts_3d: (..., N, 3) points in world/object coordinates.
        K: (..., 3, 3) intrinsics.
        pose: (..., 4, 4) or (..., 3, 4) world->camera pose.

    Returns:
        (..., N, 2) pixel coordinates.
    """
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    cam = jnp.einsum("...ij,...nj->...ni", R, pts_3d) + t[..., None, :]
    proj = jnp.einsum("...ij,...nj->...ni", K, cam)
    z = proj[..., 2:3]
    # Guard against division by ~0 depth; the reference divides unguarded and
    # relies on downstream nan_to_num. We keep the same numerics for z > eps.
    z = jnp.where(jnp.abs(z) < 1e-9, jnp.where(z < 0, -1e-9, 1e-9), z)
    return proj[..., :2] / z


def project_bbox3d(pose: jax.Array, K: jax.Array, bbox_3d: jax.Array) -> jax.Array:
    """Project the 8 corners of a 3D bbox to 2D (reference ``make_proj_bbox``,
    src/datasets/utils/base/camera_utils.py:62-85).

    Args:
        pose: (..., 4, 4) world->camera poses.
        K: (..., 3, 3) intrinsics.
        bbox_3d: (..., 8, 3) or (8, 3) corner points.

    Returns:
        (..., 8, 2) projected pixel coordinates.
    """
    bbox_3d = jnp.broadcast_to(bbox_3d, pose.shape[:-2] + (8, 3))
    return project_points(bbox_3d, K, pose)


@highp
def transform_points(pose: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a rigid transform: (..., 4, 4) x (..., N, 3) -> (..., N, 3)."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


@highp
def invert_pose(pose: jax.Array) -> jax.Array:
    """Invert a rigid 4x4 transform analytically (no linear solve)."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    new_t = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, new_t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), pose.shape[:-2] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


@highp
def compose_poses(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose rigid transforms: returns a @ b."""
    return jnp.einsum("...ij,...jk->...ik", a, b)


# ---------------------------------------------------------------------------
# NDC <-> pixels (PyTorch3D screen-NDC convention used by the reference)
# ---------------------------------------------------------------------------


def ndc_to_pixels(fl: jax.Array, pp: jax.Array, image_size_wh: jax.Array):
    """NDC focal/principal-point -> pixels (src/utils/camera_transform.py:68-77).

    Args:
        fl: (..., 2) NDC focal lengths (fx, fy).
        pp: (..., 2) NDC principal point.
        image_size_wh: (..., 2) image size as (W, H).

    Returns:
        (focal_px, pp_px), each (..., 2).
    """
    half = image_size_wh / 2.0
    pp_px = half - pp * half
    fl_px = fl * half
    return fl_px, pp_px


def pixels_to_ndc(fl_px: jax.Array, pp_px: jax.Array, image_size_wh: jax.Array):
    """Pixel focal/principal-point -> NDC (src/utils/camera_transform.py:80-89)."""
    half = image_size_wh / 2.0
    pp = (half - pp_px) / half
    fl = fl_px / half
    return fl, pp


def adjust_camera_to_bbox_crop(
    fl: jax.Array, pp: jax.Array, image_size_wh: jax.Array, bbox_xywh: jax.Array
):
    """Re-express an NDC camera relative to a crop window
    (src/utils/camera_transform.py:32-45).

    Args:
        fl, pp: (..., 2) NDC focal / principal point w.r.t. the full image.
        image_size_wh: (..., 2) full-image size (W, H).
        bbox_xywh: (..., 4) crop box as (x, y, w, h) in pixels.

    Returns:
        (focal_ndc, pp_ndc) w.r.t. the crop window.
    """
    fl_px, pp_px = ndc_to_pixels(fl, pp, image_size_wh)
    pp_px_cropped = pp_px - bbox_xywh[..., :2]
    return pixels_to_ndc(fl_px, pp_px_cropped, bbox_xywh[..., 2:])


def adjust_camera_to_image_scale(
    fl: jax.Array, pp: jax.Array, original_size_wh: jax.Array, new_size_wh: jax.Array
):
    """Re-express an NDC camera after resizing
    (src/utils/camera_transform.py:48-65)."""
    fl_px, pp_px = ndc_to_pixels(fl, pp, original_size_wh)
    scale = new_size_wh / original_size_wh
    return pixels_to_ndc(fl_px * scale, pp_px * scale, new_size_wh)


# ---------------------------------------------------------------------------
# Crop / bbox helpers (host- or device-side; all vectorized)
# ---------------------------------------------------------------------------


def square_bbox(bbox_xyxy: jax.Array, padding: float = 0.0) -> jax.Array:
    """Expand a bbox to a square around its center
    (src/datasets/utils/preprocess.py:22-45).

    Args:
        bbox_xyxy: (..., 4) [x_min, y_min, x_max, y_max].
        padding: fractional padding on the half-extent.

    Returns:
        (..., 4) square bbox.
    """
    center = (bbox_xyxy[..., :2] + bbox_xyxy[..., 2:]) / 2.0
    extents = (bbox_xyxy[..., 2:] - bbox_xyxy[..., :2]) / 2.0
    size = jnp.max(extents, axis=-1, keepdims=True) * (1.0 + padding)
    return jnp.concatenate([center - size, center + size], axis=-1)


def bbox_from_projection(proj_bbox: jax.Array) -> jax.Array:
    """Axis-aligned 2D bbox enclosing projected 3D-box corners
    (reference ``adjust_bbox_by_proj``, src/datasets/utils/base/bbox_utils.py:62-76).

    Args:
        proj_bbox: (..., 8, 2) projected corners.

    Returns:
        (..., 4) [x_min, y_min, x_max, y_max].
    """
    mins = jnp.min(proj_bbox, axis=-2)
    maxs = jnp.max(proj_bbox, axis=-2)
    return jnp.concatenate([mins, maxs], axis=-1)


def calculate_crop_parameters(
    image_size_wh: jax.Array, bbox_xyxy: jax.Array
) -> jax.Array:
    """NDC crop parameters for a square crop of the image
    (src/datasets/utils/preprocess.py:55-83).

    Args:
        image_size_wh: (..., 2) original image size (W, H).
        bbox_xyxy: (..., 4) square crop box in pixels.

    Returns:
        (..., 4) crop params [-cx_ndc, -cy_ndc, crop_width_ndc, scale].
    """
    crop_center = (bbox_xyxy[..., :2] + bbox_xyxy[..., 2:]) / 2.0
    length = jnp.max(image_size_wh, axis=-1, keepdims=True)
    scale = length[..., 0] / jnp.min(image_size_wh, axis=-1)
    crop_center = crop_center + (length - image_size_wh) / 2.0
    normalized_center = scale[..., None] - 2.0 * scale[..., None] * crop_center / length
    crop_width = (
        2.0 * scale * (bbox_xyxy[..., 2] - bbox_xyxy[..., 0]) / length[..., 0]
    )
    return jnp.stack(
        [
            -normalized_center[..., 0],
            -normalized_center[..., 1],
            crop_width,
            scale,
        ],
        axis=-1,
    )


def adjust_intrinsics_for_crop_resize(
    K: jax.Array, crop_xyxy: jax.Array, out_size_wh: jax.Array
) -> jax.Array:
    """Intrinsics after cropping to ``crop_xyxy`` then resizing to
    ``out_size_wh`` — the composed pixel-space equivalent of the reference's
    NDC round-trip (crop via adjust_camera_to_bbox_crop_ then rescale via
    adjust_camera_to_image_scale_; src/datasets/base.py:566-626).

    Args:
        K: (..., 3, 3) intrinsics.
        crop_xyxy: (..., 4) crop box in pixels.
        out_size_wh: (..., 2) output size (W, H).

    Returns:
        (..., 3, 3) adjusted intrinsics for the crop.
    """
    crop_wh = crop_xyxy[..., 2:] - crop_xyxy[..., :2]
    scale = out_size_wh / crop_wh
    fx = K[..., 0, 0] * scale[..., 0]
    fy = K[..., 1, 1] * scale[..., 1]
    cx = (K[..., 0, 2] - crop_xyxy[..., 0]) * scale[..., 0]
    cy = (K[..., 1, 2] - crop_xyxy[..., 1]) * scale[..., 1]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zeros, cx], axis=-1)
    row1 = jnp.stack([zeros, fy, cy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def adjust_intrinsics_for_padding(K: jax.Array, pad_left, pad_top) -> jax.Array:
    """Shift the principal point after padding the image on the left/top
    (reference ``adjust_camera_intrinsics``, src/datasets/utils/preprocess.py:48-52)."""
    K = jnp.asarray(K)
    K = K.at[..., 0, 2].add(pad_left)
    K = K.at[..., 1, 2].add(pad_top)
    return K

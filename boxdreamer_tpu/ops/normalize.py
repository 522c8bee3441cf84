"""Camera normalization in pure OpenCV-convention matrix math.

Replaces the reference's PyTorch3D round-trip (src/utils/camera_transform.py:
92-300 plus the `cameras_from_opencv_projection` / `opencv_from_cameras_
projection` conversions and the rotate-180 fix-up in src/datasets/base.py:
628-681). Worked out on paper, the whole PyTorch3D excursion for the
``first_camera`` coordinate mode reduces to the relative pose

    P_i_new = P_i @ inv(P_0),   coordinate_transform = P_0,

which is what :func:`first_camera_normalize` computes directly. The default
eval config uses ``coordinate='object'`` with ``compute_optical=False`` and
``normalize_trans=False``, i.e. the identity; all three normalizations are
still provided for full parity with the reference's config space.

All functions take (T, 4, 4) world->camera OpenCV poses for one sequence and
are jit/vmap-friendly (query_idx may be a traced integer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boxdreamer_tpu.utils.precision import highp

from boxdreamer_tpu.ops import camera as camera_ops


@highp
def first_camera_normalize(poses: jax.Array):
    """Re-express all poses relative to camera 0's frame.

    Net effect of the reference's first_camera_transform + axis flips
    (src/utils/camera_transform.py:236-260, src/datasets/base.py:670-676).

    Returns:
        (new_poses (T,4,4), coordinate_transform (4,4) = original pose 0),
        satisfying ``new_pose @ coordinate_transform == pose``.
    """
    p0 = poses[0]
    inv_p0 = camera_ops.invert_pose(p0)
    new_poses = jnp.einsum("tij,jk->tik", poses, inv_p0)
    return new_poses, p0


@highp
def optical_axis_intersection(poses: jax.Array):
    """Least-squares intersection point of all cameras' optical axes
    (reference compute_optical_axis_intersection + intersect_skew_lines,
    src/utils/camera_transform.py:166-233).

    Returns:
        (p_intersect (3,), dist0) where dist0 is the distance from camera 0's
        center to the intersection point.
    """
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    centers = -jnp.einsum("tji,tj->ti", R, t)  # -R^T t
    axes = R[:, 2, :]  # R^T e_z: viewing direction in world coords
    axes = axes / jnp.maximum(jnp.linalg.norm(axes, axis=-1, keepdims=True), 1e-9)
    eye = jnp.eye(3, dtype=poses.dtype)
    proj = eye[None] - axes[:, :, None] * axes[:, None, :]  # (T, 3, 3)
    A = proj.sum(0)
    b = jnp.einsum("tij,tj->i", proj, centers)
    p = jnp.linalg.solve(A + 1e-9 * eye, b)
    dist0 = jnp.linalg.norm(p - centers[0])
    return p, dist0


@highp
def optical_normalize(poses: jax.Array, points: jax.Array | None = None):
    """Shift the world origin to the optical-axis intersection and scale so
    camera 0 is at unit distance (reference compute_optical_transform,
    src/utils/camera_transform.py:137-163).

    Returns:
        (new_poses, new_points, scale).
    """
    p, scale = optical_axis_intersection(poses)
    scale = jnp.maximum(scale, 1e-9)
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    new_t = (t + jnp.einsum("tij,j->ti", R, p)) / scale
    new_poses = poses.at[:, :3, 3].set(new_t)
    if points is not None:
        points = (points - p) / scale
    return new_poses, points, scale


def translation_scale(
    poses: jax.Array,
    query_idx: jax.Array | int,
    first_camera: bool = True,
    max_norm: bool = False,
) -> jax.Array:
    """Scale used to normalize translations (reference normalize_translation,
    src/utils/camera_transform.py:263-300), with the same reference-frame
    exclusion rules: the query camera is excluded, and camera 0 too when
    ``first_camera`` and more than one reference remains (unless the query is
    the only other camera).

    Returns a scalar scale.
    """
    T = poses.shape[0]
    t = poses[:, :3, 3]
    idx = jnp.arange(T)
    mask = (idx != query_idx).astype(poses.dtype)
    if first_camera:
        n_ref = mask.sum()
        # Exclude camera 0 when >1 reference; if only one ref remains, use all.
        mask_no0 = mask * (idx != 0).astype(poses.dtype)
        mask = jnp.where(n_ref > 1, mask_no0, jnp.ones_like(mask))
    n = jnp.maximum(mask.sum(), 1.0)
    if max_norm:
        norms = jnp.linalg.norm(t, axis=-1)
        scale = jnp.max(jnp.where(mask > 0, norms, -jnp.inf))
    else:
        frob = jnp.sqrt(((t**2).sum(-1) * mask).sum())
        scale = frob / jnp.sqrt(n) / 2.0
    return jnp.clip(scale, 0.01, 100.0)


@highp
def normalize_cameras(
    poses: jax.Array,
    query_idx: jax.Array | int,
    compute_optical: bool = False,
    first_camera: bool = False,
    normalize_trans: bool = False,
    max_norm: bool = False,
    points: jax.Array | None = None,
):
    """Full normalization chain (reference normalize_cameras,
    src/utils/camera_transform.py:92-134): optical -> first-camera ->
    translation scale. The flags mirror the reference call sites; the default
    dataset path passes all False (identity).

    Returns:
        (new_poses, points, scale, coordinate_transform) where metric-time
        undo is ``pose[:3, 3] *= scale; pose = pose @ coordinate_transform``.
    """
    scale = jnp.asarray(1.0, dtype=poses.dtype)
    transform = jnp.eye(4, dtype=poses.dtype)
    if compute_optical:
        poses, points, scale = optical_normalize(poses, points)
    if first_camera:
        poses, transform = first_camera_normalize(poses)
    if normalize_trans:
        s3 = translation_scale(poses, query_idx, first_camera, max_norm)
        poses = poses.at[:, :3, 3].divide(s3)
        if points is not None:
            points = points / s3
        scale = scale * s3
    return poses, points, scale, transform


@highp
def denormalize_pose(
    pose: jax.Array, scale: jax.Array, coordinate_transform: jax.Array
) -> jax.Array:
    """Undo normalization at metric time (reference metric_utils.py:281-283):
    ``pose[:3, 3] *= scale; pose = pose @ coordinate_transform``."""
    scale = jnp.broadcast_to(jnp.asarray(scale), pose[..., :3, 3].shape)
    pose = pose.at[..., :3, 3].multiply(scale)
    return jnp.einsum("...ij,...jk->...ik", pose, coordinate_transform)

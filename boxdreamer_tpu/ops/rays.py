"""Plücker ray camera representation (pure JAX, OpenCV conventions).

Equivalent of the reference's RayDiffusion-derived ray machinery
(src/models/utils/rays.py:9-560): per-patch rays as (direction, moment)
Plücker coordinates, camera -> rays unprojection over the crop's NDC grid,
and rays -> camera recovery (skew-line least-squares center + orthogonal-
Procrustes rotation; homography variant with RANSAC for unknown
intrinsics).

Convention note: the reference routes through PyTorch3D cameras whose view
coordinates are ``diag(-1,-1,1)`` times OpenCV camera coordinates and whose
screen NDC x/y axes point left/up. Worked through, a pixel at PyTorch3D-NDC
``(x', y')`` for an OpenCV camera (R, t) with NDC intrinsics (fl, pp) has
world ray direction

    d = R^T @ diag(-1,-1,1) @ [(x'-ppx)/flx, (y'-ppy)/fly, 1]

from origin ``c = -R^T t``; everything below is that closed form, batched —
no camera objects, no per-sample loops, no cv2.findHomography (the RANSAC
homography is a fixed-hypothesis jittable solve).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from boxdreamer_tpu.ops import rotation as rot_ops
from boxdreamer_tpu.utils.precision import highp

FLIP = jnp.diag(jnp.array([-1.0, -1.0, 1.0]))


# ---------------------------------------------------------------------------
# NDC patch grid
# ---------------------------------------------------------------------------


def compute_ndc_grid(
    crop_parameters: Optional[jax.Array],
    num_patches_x: int = 16,
    num_patches_y: int = 16,
    use_half_pix: bool = True,
) -> jax.Array:
    """Patch-center NDC coordinates (reference compute_ndc_coordinates,
    rays.py:507-560): PyTorch3D screen NDC (+1 at the left/top), adjusted by
    the crop parameters (cc_x, cc_y, crop_width, scale).

    Args:
        crop_parameters: (..., 4) or None for the full image.

    Returns:
        (..., P, 3) grid of (x', y', 1) with P = num_patches_x*num_patches_y.
    """
    dx = 1.0 / num_patches_x
    dy = 1.0 / num_patches_y
    if use_half_pix:
        ys = jnp.linspace(1 - dy, -(1 - dy), num_patches_y)
        xs = jnp.linspace(1 - dx, -(1 - dx), num_patches_x)
    else:
        ys = jnp.linspace(1.0, -1 + 2 * dy, num_patches_y)
        xs = jnp.linspace(1.0, -1 + 2 * dx, num_patches_x)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (py, px)
    if crop_parameters is None:
        cc_x = cc_y = 0.0
        width = 2.0
        lead = ()
    else:
        cc_x = crop_parameters[..., 0:1, None]
        cc_y = crop_parameters[..., 1:2, None]
        width = crop_parameters[..., 2:3, None]
        lead = crop_parameters.shape[:-1]
    x_prime = gx * width / 2.0 - cc_x
    y_prime = gy * width / 2.0 - cc_y
    ones = jnp.broadcast_to(jnp.ones_like(gx), x_prime.shape)
    grid = jnp.stack([x_prime, y_prime, ones], axis=-1)
    return grid.reshape(lead + (num_patches_x * num_patches_y, 3))


# ---------------------------------------------------------------------------
# Plücker conversions
# ---------------------------------------------------------------------------


def to_plucker(origins: jax.Array, directions: jax.Array) -> jax.Array:
    """(origin, direction) -> (unit direction, moment) rays (..., 6)
    (reference Rays.to_plucker, rays.py:150-167)."""
    d = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12
    )
    m = jnp.cross(origins, d)
    return jnp.concatenate([d, m], axis=-1)


def to_point_direction(plucker: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(direction, moment) -> (closest point to origin, unit direction)
    (reference Rays.to_point_direction, rays.py:128-149)."""
    d = plucker[..., :3]
    m = plucker[..., 3:]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    origins = jnp.cross(d, m)
    return origins, d


def rays_to_spatial(plucker: jax.Array, grid: int) -> jax.Array:
    """(..., P, 6) -> (..., 6, H, W) (reference Rays.to_spatial)."""
    *lead, P, D = plucker.shape
    x = jnp.swapaxes(plucker, -1, -2)
    return x.reshape(*lead, D, grid, grid)


def rays_from_spatial(spatial: jax.Array) -> jax.Array:
    """(..., 6, H, W) -> (..., P, 6) (reference Rays.from_spatial)."""
    *lead, D, H, W = spatial.shape
    x = spatial.reshape(*lead, D, H * W)
    return jnp.swapaxes(x, -1, -2)


# ---------------------------------------------------------------------------
# Cameras -> rays
# ---------------------------------------------------------------------------


@highp
def cameras_to_rays(
    poses: jax.Array,
    fl_ndc: jax.Array,
    pp_ndc: jax.Array,
    crop_parameters: Optional[jax.Array],
    num_patches_x: int = 16,
    num_patches_y: int = 16,
    use_half_pix: bool = True,
) -> jax.Array:
    """Unproject the patch grid into world-space Plücker rays
    (reference cameras_to_rays, rays.py:254-306).

    Args:
        poses: (B, 4, 4) OpenCV world->camera.
        fl_ndc, pp_ndc: (B, 2) NDC intrinsics (see ops.camera.pixels_to_ndc).
        crop_parameters: (B, 4) or None.

    Returns:
        (B, P, 6) Plücker rays.
    """
    grid = compute_ndc_grid(
        crop_parameters, num_patches_x, num_patches_y, use_half_pix
    )
    if grid.ndim == 2:
        grid = jnp.broadcast_to(
            grid, poses.shape[:-2] + grid.shape
        )
    # View-space direction for each patch: ((x'-ppx)/flx, (y'-ppy)/fly, 1).
    v = jnp.stack(
        [
            (grid[..., 0] - pp_ndc[..., None, 0]) / fl_ndc[..., None, 0],
            (grid[..., 1] - pp_ndc[..., None, 1]) / fl_ndc[..., None, 1],
            jnp.ones_like(grid[..., 2]),
        ],
        axis=-1,
    )
    R = poses[..., :3, :3]
    t = poses[..., :3, 3]
    cam_dir = jnp.einsum("ij,...pj->...pi", FLIP, v)  # OpenCV camera coords
    world_dir = jnp.einsum("...ji,...pj->...pi", R, cam_dir)
    centers = -jnp.einsum("...ji,...j->...i", R, t)
    origins = jnp.broadcast_to(centers[..., None, :], world_dir.shape)
    return to_plucker(origins, world_dir)


# ---------------------------------------------------------------------------
# Rays -> cameras
# ---------------------------------------------------------------------------


def intersect_skew_lines(origins: jax.Array, directions: jax.Array) -> jax.Array:
    """Least-squares intersection of a bundle of lines (..., P, 3) -> (..., 3)
    (reference normalize.intersect_skew_lines_high_dim)."""
    d = directions / jnp.maximum(
        jnp.linalg.norm(directions, axis=-1, keepdims=True), 1e-12
    )
    eye = jnp.eye(3, dtype=origins.dtype)
    proj = eye - d[..., :, None] * d[..., None, :]  # (..., P, 3, 3)
    A = proj.sum(axis=-3)
    b = jnp.einsum("...pij,...pj->...i", proj, origins)
    # Explicit column vector: with batched A, a 2-D b would be treated as a
    # matrix by the numpy solve rules.
    return jnp.linalg.solve(A + 1e-9 * eye, b[..., None])[..., 0]


def procrustes_align(A: jax.Array, B: jax.Array) -> jax.Array:
    """R minimizing ||A - B R^T||_F, i.e. a_i ~ R b_i
    (reference compute_optimal_rotation_alignment, rays.py:444-462).

    Args:
        A, B: (..., N, 3).

    Returns:
        (..., 3, 3) rotation.
    """
    M = jnp.einsum("...ni,...nj->...ij", A, B)  # sum a b^T
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    S = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt)


@highp
def rays_to_cameras(
    plucker: jax.Array,
    crop_parameters: Optional[jax.Array],
    fl_ndc: jax.Array,
    pp_ndc: jax.Array,
    num_patches_x: int = 16,
    num_patches_y: int = 16,
    use_half_pix: bool = True,
) -> jax.Array:
    """Recover OpenCV poses from predicted Plücker rays using known
    intrinsics (reference rays_to_cameras, rays.py:308-366).

    Returns:
        (B, 4, 4) world->camera poses.
    """
    origins, directions = to_point_direction(plucker)
    centers = intersect_skew_lines(origins, directions)

    # Identity-camera patch directions with the same intrinsics.
    grid = compute_ndc_grid(
        crop_parameters, num_patches_x, num_patches_y, use_half_pix
    )
    if grid.ndim == 2:
        grid = jnp.broadcast_to(grid, plucker.shape[:-2] + grid.shape)
    v = jnp.stack(
        [
            (grid[..., 0] - pp_ndc[..., None, 0]) / fl_ndc[..., None, 0],
            (grid[..., 1] - pp_ndc[..., None, 1]) / fl_ndc[..., None, 1],
            jnp.ones_like(grid[..., 2]),
        ],
        axis=-1,
    )
    d_I = jnp.einsum("ij,...pj->...pi", FLIP, v)
    d_I = d_I / jnp.maximum(jnp.linalg.norm(d_I, axis=-1, keepdims=True), 1e-12)

    # World dir satisfies d_world = R^T d_I  =>  d_I ~ R d_world.
    R = procrustes_align(d_I, directions)
    t = -jnp.einsum("...ij,...j->...i", R, centers)
    pose = jnp.broadcast_to(jnp.eye(4, dtype=plucker.dtype), plucker.shape[:-2] + (4, 4))
    pose = pose.at[..., :3, :3].set(R)
    pose = pose.at[..., :3, 3].set(t)
    return pose


# ---------------------------------------------------------------------------
# Homography variant (unknown intrinsics)
# ---------------------------------------------------------------------------


def _homography_dlt(src: jax.Array, dst: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted DLT homography: dst ~ H src for (N, 2) points."""
    N = src.shape[0]
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros((N, 3), dtype=src.dtype)
    sh = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    row_u = jnp.concatenate([sh, zeros, -u[:, None] * sh], axis=-1)
    row_v = jnp.concatenate([zeros, sh, -v[:, None] * sh], axis=-1)
    A = jnp.concatenate([row_u * weights[:, None], row_v * weights[:, None]], axis=0)
    _, eigvecs = jnp.linalg.eigh(A.T @ A)
    return eigvecs[:, 0].reshape(3, 3)


def ransac_homography(
    src: jax.Array,
    dst: jax.Array,
    threshold: float = 0.2,
    num_hypotheses: int = 32,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Fixed-hypothesis RANSAC homography (replaces cv2.findHomography at
    rays.py:492-497). src/dst: (N, 2)."""
    N = src.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, num_hypotheses)
    subsets = jax.vmap(
        lambda k: jax.random.choice(k, N, shape=(4,), replace=False)
    )(keys)

    def hypothesis(subset):
        w = jnp.zeros(N, dtype=src.dtype).at[subset].set(1.0)
        H = _homography_dlt(src, dst, w)
        proj = jnp.concatenate([src, jnp.ones((N, 1), src.dtype)], axis=-1) @ H.T
        proj = proj[:, :2] / jnp.where(jnp.abs(proj[:, 2:]) < 1e-12, 1e-12, proj[:, 2:])
        err = jnp.linalg.norm(proj - dst, axis=-1)
        inliers = (err < threshold).astype(src.dtype)
        return H, inliers, inliers.sum()

    Hs, inls, scores = jax.vmap(hypothesis)(subsets)
    best = jnp.argmax(scores)
    w = inls[best]
    w = jnp.where(w.sum() >= 4, w, jnp.ones_like(w))
    return _homography_dlt(src, dst, w)


def ql_decomposition(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """QL decomposition via permuted QR with positive diagonal
    (reference ql_decomposition, rays.py:369-383)."""
    P = jnp.array([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=A.dtype)
    Q_t, R_t = jnp.linalg.qr(A @ P)
    Q = Q_t @ P
    L = P @ R_t @ P
    d = jnp.sign(jnp.diagonal(L))
    d = jnp.where(d == 0, 1.0, d)
    Q = Q * d[None, :]
    L = L * d[:, None]
    return Q, L


@highp
def rays_to_cameras_homography(
    plucker: jax.Array,
    crop_parameters: Optional[jax.Array],
    num_patches_x: int = 16,
    num_patches_y: int = 16,
    use_half_pix: bool = True,
    reproj_threshold: float = 0.2,
    num_hypotheses: int = 32,
):
    """Recover pose AND intrinsics from rays via a homography between
    identity-camera patch directions and predicted directions
    (reference rays_to_cameras_homography, rays.py:385-442).

    Returns:
        (poses (B, 4, 4), fl_ndc (B, 2), pp_ndc (B, 2)).
    """
    origins, directions = to_point_direction(plucker)
    centers = intersect_skew_lines(origins, directions)

    grid = compute_ndc_grid(
        crop_parameters, num_patches_x, num_patches_y, use_half_pix
    )
    if grid.ndim == 2:
        grid = jnp.broadcast_to(grid, plucker.shape[:-2] + grid.shape)
    d_I = jnp.einsum("ij,...pj->...pi", FLIP, grid)  # identity cam, f=1, pp=0

    def solve_one(d_i, d_w, center):
        src = d_i[:, :2] / d_i[:, 2:]
        dst = d_w[:, :2] / jnp.where(
            jnp.abs(d_w[:, 2:]) < 1e-6, 1e-6, d_w[:, 2:]
        )
        H = ransac_homography(src, dst, reproj_threshold, num_hypotheses)
        H = H * jnp.where(jnp.linalg.det(H) < 0, -1.0, 1.0)
        Q, L = ql_decomposition(H)
        L = L / L[2, 2]
        f = jnp.stack([L[0, 0], L[1, 1]])
        pp = jnp.stack([L[2, 0], L[2, 1]])
        R = Q.T  # d_world ~ Q applied to identity dirs => pose rotation Q^T
        t = -R @ center
        pose = jnp.eye(4, dtype=plucker.dtype).at[:3, :3].set(R).at[:3, 3].set(t)
        return pose, f, pp

    flat_dI = d_I.reshape(-1, d_I.shape[-2], 3)
    flat_dw = directions.reshape(-1, directions.shape[-2], 3)
    flat_c = centers.reshape(-1, 3)
    poses, fs, pps = jax.vmap(solve_one)(flat_dI, flat_dw, flat_c)
    lead = plucker.shape[:-2]
    return (
        poses.reshape(lead + (4, 4)),
        fs.reshape(lead + (2,)),
        pps.reshape(lead + (2,)),
    )

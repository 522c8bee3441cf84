"""Batched, jittable PnP: DLT initialization + Gauss-Newton refinement,
plus a fixed-iteration RANSAC variant for dense multi-proposal mode.

This replaces the reference's #1 host round-trip: a Python double loop over
(batch, time) calling ``cv2.solvePnP``/``cv2.solvePnPRansac``/``cv2.Rodrigues``
on CPU (src/models/utils/box_utils.py:113-304). Note the reference's default
path hard-forces the RANSAC result to be discarded and always uses the plain
ITERATIVE solve on all 8 points (box_utils.py:169); :func:`solve_pnp`
reproduces exactly that behavior (DLT init + iterative reprojection-error
minimization on all points), fully vmapped on device.

All math is float32; poses returned as (..., 4, 4) world->camera (OpenCV).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from boxdreamer_tpu.ops import rotation
from boxdreamer_tpu.utils.precision import highp

GN_ITERS_DEFAULT = 20


# ---------------------------------------------------------------------------
# DLT initialization
# ---------------------------------------------------------------------------


def _dlt(pts_3d: jax.Array, pts_2d_norm: jax.Array, weights: jax.Array):
    """Weighted DLT for a single problem.

    Args:
        pts_3d: (N, 3) object points.
        pts_2d_norm: (N, 2) normalized image coordinates (K^-1 applied).
        weights: (N,) per-point weights (0/1 masks for RANSAC subsets).

    Returns:
        (R (3,3), t (3,)) initial pose estimate.
    """
    N = pts_3d.shape[0]
    # Hartley-style normalization of the 3D points for conditioning.
    wsum = jnp.maximum(weights.sum(), 1e-9)
    centroid = (pts_3d * weights[:, None]).sum(0) / wsum
    centered = pts_3d - centroid
    scale = jnp.sqrt(
        jnp.maximum(((centered**2).sum(-1) * weights).sum() / wsum, 1e-12)
    )
    Xn = centered / scale  # (N, 3)

    u = pts_2d_norm[:, 0]
    v = pts_2d_norm[:, 1]
    zeros = jnp.zeros((N, 4), dtype=pts_3d.dtype)
    Xh = jnp.concatenate([Xn, jnp.ones((N, 1), dtype=pts_3d.dtype)], axis=-1)
    row_u = jnp.concatenate([Xh, zeros, -u[:, None] * Xh], axis=-1)  # (N, 12)
    row_v = jnp.concatenate([zeros, Xh, -v[:, None] * Xh], axis=-1)  # (N, 12)
    A = jnp.concatenate([row_u * weights[:, None], row_v * weights[:, None]], axis=0)

    # Smallest eigenvector of A^T A (12x12 symmetric) — eigh is cheap and
    # batches well on TPU, unlike a tall SVD.
    AtA = A.T @ A
    _, eigvecs = jnp.linalg.eigh(AtA)
    p = eigvecs[:, 0]  # eigenvalues ascending
    P = p.reshape(3, 4)

    # Undo 3D normalization: X_n = (X - c)/s  =>  P_full = P @ T.
    M = P[:, :3] / scale
    t_col = P[:, 3] - (P[:, :3] / scale) @ centroid
    # Fix overall scale/sign: ||row3 of M|| = 1, mean depth > 0.
    norm_r3 = jnp.maximum(jnp.linalg.norm(M[2]), 1e-12)
    M = M / norm_r3
    t_col = t_col / norm_r3
    depths = Xn @ (M[2] * scale) + (M[2] @ centroid + t_col[2])
    sign = jnp.where((depths * weights).sum() < 0, -1.0, 1.0)
    M = M * sign
    t_col = t_col * sign
    R = rotation.orthogonalize(M)
    return R, t_col


# ---------------------------------------------------------------------------
# Gauss-Newton refinement on SE(3)
# ---------------------------------------------------------------------------


def _gn_refine(
    R: jax.Array,
    t: jax.Array,
    pts_3d: jax.Array,
    pts_2d: jax.Array,
    K: jax.Array,
    weights: jax.Array,
    iters: int,
):
    """Minimize weighted pixel reprojection error with fixed GN iterations.

    Left-multiplicative update ``R <- exp(dtheta) R, t <- t + dt`` — the same
    objective cv2 ITERATIVE's Levenberg-Marquardt minimizes.
    """
    fx = K[0, 0]
    fy = K[1, 1]
    cx = K[0, 2]
    cy = K[1, 2]

    def body(carry, _):
        R, t = carry
        p = pts_3d @ R.T + t  # (N, 3) camera coords
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        u = fx * p[:, 0] / z + cx
        v = fy * p[:, 1] / z + cy
        r = jnp.stack([u - pts_2d[:, 0], v - pts_2d[:, 1]], axis=-1)  # (N, 2)

        inv_z = 1.0 / z
        # d(u,v)/dp  (N, 2, 3)
        zero = jnp.zeros_like(inv_z)
        J_proj = jnp.stack(
            [
                jnp.stack([fx * inv_z, zero, -fx * p[:, 0] * inv_z**2], axis=-1),
                jnp.stack([zero, fy * inv_z, -fy * p[:, 1] * inv_z**2], axis=-1),
            ],
            axis=-2,
        )
        # dp/d(dtheta) = -hat(R X) ; dp/d(dt) = I
        RX = p - t
        J_rot = -rotation.hat(RX)  # (N, 3, 3)
        J_se3 = jnp.concatenate(
            [J_rot, jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), J_rot.shape)], axis=-1
        )  # (N, 3, 6)
        J = jnp.einsum("nij,njk->nik", J_proj, J_se3)  # (N, 2, 6)

        w = weights[:, None, None]
        JtJ = jnp.einsum("nik,nil->kl", J * w, J)
        Jtr = jnp.einsum("nik,ni->k", J * w, r)
        damping = 1e-8 * jnp.trace(JtJ) + 1e-12
        delta = -jnp.linalg.solve(JtJ + damping * jnp.eye(6, dtype=R.dtype), Jtr)
        dR = rotation.rodrigues(delta[:3])
        new_R = dR @ R
        new_t = t + delta[3:]
        # Reject steps that blow up (keeps degenerate inputs finite).
        ok = jnp.all(jnp.isfinite(delta))
        new_R = jnp.where(ok, new_R, R)
        new_t = jnp.where(ok, new_t, t)
        return (new_R, new_t), None

    (R, t), _ = jax.lax.scan(body, (R, t), None, length=iters)
    return R, t


def _reprojection_errors(
    R: jax.Array, t: jax.Array, pts_3d: jax.Array, pts_2d: jax.Array, K: jax.Array
):
    p = pts_3d @ R.T + t
    z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
    u = K[0, 0] * p[:, 0] / z + K[0, 2]
    v = K[1, 1] * p[:, 1] / z + K[1, 2]
    return jnp.sqrt((u - pts_2d[:, 0]) ** 2 + (v - pts_2d[:, 1]) ** 2)


# ---------------------------------------------------------------------------
# Public solvers
# ---------------------------------------------------------------------------


def _solve_pnp_single(
    pts_3d: jax.Array, pts_2d: jax.Array, K: jax.Array, iters: int
) -> jax.Array:
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((pts_2d.shape[0], 1), dtype=pts_2d.dtype)
    homog = jnp.concatenate([pts_2d, ones], axis=-1)
    pts_2d_norm = (homog @ Kinv.T)[:, :2]
    w = jnp.ones(pts_3d.shape[0], dtype=pts_3d.dtype)
    R0, t0 = _dlt(pts_3d, pts_2d_norm, w)
    R, t = _gn_refine(R0, t0, pts_3d, pts_2d, K, w, iters)
    pose = jnp.eye(4, dtype=pts_3d.dtype)
    pose = pose.at[:3, :3].set(R)
    pose = pose.at[:3, 3].set(t)
    return pose


@partial(jax.jit, static_argnames=("iters",))
@highp
def solve_pnp(
    pts_3d: jax.Array, pts_2d: jax.Array, K: jax.Array, iters: int = GN_ITERS_DEFAULT
) -> jax.Array:
    """Batched PnP solve (DLT + Gauss-Newton), equivalent of the reference's
    per-sample ``cv2.solvePnP(..., flags=SOLVEPNP_ITERATIVE)`` fallback
    (src/models/utils/box_utils.py:171-179) that the default path always takes.

    Args:
        pts_3d: (..., N, 3) object points (N >= 6).
        pts_2d: (..., N, 2) pixel observations.
        K: (..., 3, 3) intrinsics.

    Returns:
        (..., 4, 4) world->camera poses.
    """
    pts_3d = pts_3d.astype(jnp.float32)
    pts_2d = pts_2d.astype(jnp.float32)
    K = jnp.broadcast_to(K, pts_3d.shape[:-2] + (3, 3)).astype(jnp.float32)
    lead = pts_3d.shape[:-2]
    f = _solve_pnp_single
    for _ in lead:
        f = jax.vmap(f, in_axes=(0, 0, 0, None))
    return f(pts_3d, pts_2d, K, iters)


def _solve_pnp_ransac_single(
    pts_3d: jax.Array,
    pts_2d: jax.Array,
    K: jax.Array,
    subsets: jax.Array,
    threshold: float,
    iters: int,
) -> jax.Array:
    """RANSAC over precomputed index subsets, then GN refine on inliers."""
    N = pts_3d.shape[0]
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((N, 1), dtype=pts_2d.dtype)
    pts_2d_norm = (jnp.concatenate([pts_2d, ones], axis=-1) @ Kinv.T)[:, :2]

    def hypothesis(subset):
        w = jnp.zeros(N, dtype=pts_3d.dtype).at[subset].set(1.0)
        R0, t0 = _dlt(pts_3d, pts_2d_norm, w)
        R, t = _gn_refine(R0, t0, pts_3d, pts_2d, K, w, 5)
        errs = _reprojection_errors(R, t, pts_3d, pts_2d, K)
        inliers = (errs < threshold).astype(jnp.float32)
        score = inliers.sum()
        return R, t, inliers, score

    Rs, ts, inls, scores = jax.vmap(hypothesis)(subsets)
    best = jnp.argmax(scores)
    R_best, t_best = Rs[best], ts[best]
    inlier_w = inls[best]
    # LO-RANSAC: refine on the inlier set (all points if too few inliers),
    # re-classify inliers with the refined pose, refine again. The second
    # round recovers points the minimal-subset pose put just past the
    # threshold (cv2's internal refinement loop behaves similarly).
    inlier_w = jnp.where(inlier_w.sum() >= 6, inlier_w, jnp.ones_like(inlier_w))
    R, t = _gn_refine(R_best, t_best, pts_3d, pts_2d, K, inlier_w, iters)
    errs = _reprojection_errors(R, t, pts_3d, pts_2d, K)
    inlier_w2 = (errs < threshold).astype(jnp.float32)
    inlier_w2 = jnp.where(inlier_w2.sum() >= 6, inlier_w2, inlier_w)
    R, t = _gn_refine(R, t, pts_3d, pts_2d, K, inlier_w2, iters)
    pose = jnp.eye(4, dtype=pts_3d.dtype)
    pose = pose.at[:3, :3].set(R)
    pose = pose.at[:3, 3].set(t)
    return pose


@partial(jax.jit, static_argnames=("num_hypotheses", "iters", "group_size"))
@highp
def solve_pnp_ransac(
    pts_3d: jax.Array,
    pts_2d: jax.Array,
    K: jax.Array,
    threshold: float = 2.0,
    num_hypotheses: int = 256,
    iters: int = GN_ITERS_DEFAULT,
    key: jax.Array | None = None,
    group_size: int | None = None,
) -> jax.Array:
    """Fixed-iteration batched RANSAC-PnP, equivalent of the reference's
    ``cv2.solvePnPRansac`` dense path (src/models/utils/box_utils.py:266-285),
    but with a static hypothesis count so the whole solve stays one XLA program.

    Args:
        pts_3d: (..., N, 3); pts_2d: (..., N, 2); K: (..., 3, 3).
        threshold: inlier reprojection-error threshold in pixels.
        num_hypotheses: number of minimal-subset hypotheses evaluated.
        key: PRNG key for subset sampling (deterministic default).
        group_size: when the points are G distinct 3D positions tiled
            S times (dense mode pools S proposals x 8 box corners, so point
            i's 3D position is class ``i % group_size``), pass G: subsets
            then draw 6 DISTINCT classes (random proposal each), so every
            hypothesis is a non-degenerate DLT problem. Uniform sampling
            over tiled corners picks 6 distinct classes only ~8% of the
            time, wasting most hypotheses on rank-deficient subsets.

    Returns:
        (..., 4, 4) world->camera poses.
    """
    pts_3d = pts_3d.astype(jnp.float32)
    pts_2d = pts_2d.astype(jnp.float32)
    K = jnp.broadcast_to(K, pts_3d.shape[:-2] + (3, 3)).astype(jnp.float32)
    N = pts_3d.shape[-2]
    if key is None:
        key = jax.random.PRNGKey(0)
    # Shared subsets across batch items: (num_hypotheses, 6) indices.
    subset_size = min(6, N)
    keys = jax.random.split(key, num_hypotheses)
    if group_size is not None and group_size >= subset_size and N % group_size == 0:
        n_groups = N // group_size

        def sample(k):
            k1, k2 = jax.random.split(k)
            classes = jax.random.choice(
                k1, group_size, shape=(subset_size,), replace=False
            )
            props = jax.random.randint(k2, (subset_size,), 0, n_groups)
            return props * group_size + classes

        subsets = jax.vmap(sample)(keys)
    else:
        subsets = jax.vmap(
            lambda k: jax.random.choice(k, N, shape=(subset_size,), replace=False)
        )(keys)

    lead = pts_3d.shape[:-2]
    f = _solve_pnp_ransac_single
    for _ in lead:
        f = jax.vmap(f, in_axes=(0, 0, 0, None, None, None))
    return f(pts_3d, pts_2d, K, subsets, threshold, iters)

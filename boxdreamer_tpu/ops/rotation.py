"""Rotation representations in pure JAX.

Replaces the reference's uses of ``cv2.Rodrigues`` (C++ on CPU,
src/models/utils/box_utils.py:183) and PyTorch3D's rotation conversions
(src/models/utils/pose_utils.py). Everything is batched and differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boxdreamer_tpu.utils.precision import highp


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


@highp
def rodrigues(rvec: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (exp map on SO(3)).

    Matches cv2.Rodrigues for the forward direction; numerically safe at
    ``theta -> 0`` via the Taylor expansion of sinc terms.
    """
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    small = theta[..., 0] < 1e-8
    # Safe normalized axis.
    axis = rvec / jnp.where(theta < 1e-8, 1.0, theta)
    K = hat(axis)
    K2 = jnp.einsum("...ij,...jk->...ik", K, K)
    st = jnp.sin(theta)[..., None]
    ct = jnp.cos(theta)[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + st * K + (1.0 - ct) * K2
    # Near zero: R ~ I + hat(rvec) (first order), exact enough at 1e-8.
    R_small = eye + hat(rvec)
    return jnp.where(small[..., None, None], R_small, R)


def inverse_rodrigues(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3) (log map)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Off-diagonal antisymmetric part.
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-6
    near_pi = theta > jnp.pi - 1e-4
    scale = jnp.where(small, 0.5, theta / jnp.where(small, 1.0, 2.0 * sin_theta))
    axis_angle = w * scale[..., None]
    # theta ~ pi: w ~ 0; recover axis from the symmetric part.
    # R + I = 2 axis axis^T at theta = pi (up to scaling by (1+cos)).
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag + 1.0) / 2.0, 0.0, 1.0)
    axis_abs = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal products.
    sx = jnp.ones_like(axis_abs[..., 0])
    sy = jnp.where(R[..., 0, 1] + R[..., 1, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 0, 2] + R[..., 2, 0] >= 0, 1.0, -1.0)
    axis_pi = axis_abs * jnp.stack([sx, sy, sz], axis=-1)
    axis_pi = axis_pi / jnp.maximum(
        jnp.linalg.norm(axis_pi, axis=-1, keepdims=True), 1e-9
    )
    return jnp.where(near_pi[..., None], axis_pi * theta[..., None], axis_angle)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) [w, x, y, z] -> rotation matrix (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) [w, x, y, z].

    Branch-free implementation: computes all four Shepperd candidates and
    selects the numerically best one with ``where`` (jit-safe).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack(
        [safe_sqrt(1 + tr) / 2] * 1
        + [
            (m21 - m12) / (2 * safe_sqrt(1 + tr)),
            (m02 - m20) / (2 * safe_sqrt(1 + tr)),
            (m10 - m01) / (2 * safe_sqrt(1 + tr)),
        ],
        axis=-1,
    )
    q1 = jnp.stack(
        [
            (m21 - m12) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
            safe_sqrt(1 + m00 - m11 - m22) / 2,
            (m01 + m10) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
            (m02 + m20) / (2 * safe_sqrt(1 + m00 - m11 - m22)),
        ],
        axis=-1,
    )
    q2 = jnp.stack(
        [
            (m02 - m20) / (2 * safe_sqrt(1 - m00 + m11 - m22)),
            (m01 + m10) / (2 * safe_sqrt(1 - m00 + m11 - m22)),
            safe_sqrt(1 - m00 + m11 - m22) / 2,
            (m12 + m21) / (2 * safe_sqrt(1 - m00 + m11 - m22)),
        ],
        axis=-1,
    )
    q3 = jnp.stack(
        [
            (m10 - m01) / (2 * safe_sqrt(1 - m00 - m11 + m22)),
            (m02 + m20) / (2 * safe_sqrt(1 - m00 - m11 + m22)),
            (m12 + m21) / (2 * safe_sqrt(1 - m00 - m11 + m22)),
            safe_sqrt(1 - m00 - m11 + m22) / 2,
        ],
        axis=-1,
    )
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].repeat(4, axis=-1), axis=-2)[
        ..., 0, :
    ]
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-9)


def sixd_to_matrix(sixd: jax.Array) -> jax.Array:
    """6D rotation representation (..., 6) -> matrix via Gram-Schmidt
    (Zhou et al. 2019; reference analogue in src/models/utils/pose_utils.py)."""
    a1 = sixd[..., :3]
    a2 = sixd[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-9)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.maximum(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-9)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_sixd(R: jax.Array) -> jax.Array:
    """Rotation matrix -> 6D representation (first two rows, flattened)."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


@highp
def orthogonalize(R: jax.Array) -> jax.Array:
    """Project a near-rotation matrix onto SO(3) via SVD."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", u, d, vt)

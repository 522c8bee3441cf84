"""Matmul precision policy.

TPU MXU matmuls on float32 inputs default to bfloat16-rounded passes, which
is perfect for the transformer but loses ~1e-3 relative accuracy — fatal for
pose geometry (PnP Jacobians, rotation algebra, DLT). The decorator below
pins HIGHEST matmul precision around the small-matrix geometry ops; these
are 3x3 / Nx12 contractions whose cost is negligible either way.

The model compute path (ViT / BETR) deliberately does NOT use this — it runs
in bf16 on the MXU at full speed.
"""

from __future__ import annotations

import functools

import jax


def highp(fn):
    """Run ``fn`` under HIGHEST default matmul precision (exact f32 on MXU)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper

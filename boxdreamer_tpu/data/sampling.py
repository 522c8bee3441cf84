"""Reference-view index selection.

Equivalent of the reference's select_ref_indices
(src/datasets/utils/base/sampling_utils.py:9-171): random / uniform /
stride (fixed or dynamic) sampling of N reference frames from the reference
database, with uniform fallback on any failure. FPS sampling is an offline
preprocessing step (view_sampler), not a runtime strategy — same as the
reference's latest behavior.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _uniform(ref_length: int, max_ref_idx: int) -> np.ndarray:
    if max_ref_idx + 1 < ref_length:
        raise ValueError(
            f"reference DB length {max_ref_idx + 1} < ref_length {ref_length}"
        )
    if max_ref_idx + 1 == ref_length:
        return np.arange(ref_length)
    stride = max(max_ref_idx // ref_length, 1)
    idxs = np.arange(0, max_ref_idx + 1, stride)
    if len(idxs) > ref_length:
        idxs = idxs[:ref_length]
    elif len(idxs) < ref_length:
        idxs = np.concatenate(
            [idxs, np.full(ref_length - len(idxs), idxs[-1] if len(idxs) else 0)]
        )
    return idxs


def select_ref_indices(
    ref_length: int,
    max_ref_idx: int,
    strategy: str = "uniform",  # 'random' | 'uniform' | 'stride'
    stride: int = 1,
    dynamic_stride: bool = False,
    min_stride: int = 1,
    max_stride: int = 1,
    query_idx: int = 0,
    anchor_to_query: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Select ``ref_length`` reference indices in [0, max_ref_idx].

    ``anchor_to_query`` reproduces the reference's non-LINEMOD stride branch
    (start near the query index); otherwise the stride window start is random.
    Any error falls back to uniform sampling (reference behavior).
    """
    rng = rng or np.random.default_rng()
    try:
        if strategy == "random":
            if ref_length > max_ref_idx + 1:
                raise ValueError("ref_length exceeds available indices")
            return np.sort(
                rng.choice(max_ref_idx + 1, size=ref_length, replace=False)
            ).astype(int)

        if strategy == "uniform":
            return _uniform(ref_length, max_ref_idx).astype(int)

        if strategy == "stride":
            s = int(rng.integers(min_stride, max_stride + 1)) if dynamic_stride else stride
            if s <= 0:
                raise ValueError("stride must be positive")
            max_start = max_ref_idx - s * ref_length
            if max_start < 0:
                s = max(max_ref_idx // ref_length, 1)
                max_start = max(max_ref_idx - s * ref_length, 0)
            if anchor_to_query:
                start = min(query_idx + s, max_start)
                start = max(start, 0)
            else:
                start = int(rng.integers(0, max_start + 1)) if max_start > 0 else 0
            idxs = np.arange(start, start + s * ref_length, s)
            if idxs[-1] > max_ref_idx:
                start = max(max_ref_idx - s * ref_length, 0)
                idxs = np.arange(start, start + s * ref_length, s)
            idxs = np.clip(idxs, 0, max_ref_idx)[:ref_length]
            if len(idxs) < ref_length:
                idxs = np.concatenate(
                    [idxs, np.full(ref_length - len(idxs), idxs[-1])]
                )
            return np.sort(idxs).astype(int)

        raise ValueError(f"unknown sampling strategy {strategy}")
    except ValueError:
        return _uniform(ref_length, max_ref_idx).astype(int)


def farthest_point_sample_cameras(
    centers: np.ndarray, n: int, start_idx: int = 0
) -> np.ndarray:
    """Farthest-point sampling of camera centers — the offline reference-DB
    builder's core (src/datasets/utils/view_sampler.py:29-89).

    Args:
        centers: (N, 3) camera centers.
        n: number of views to select.

    Returns:
        (n,) selected indices, starting from ``start_idx``.
    """
    N = len(centers)
    n = min(n, N)
    if start_idx == -1:
        # Reference semantics for query_idx=-1 (_fps_sample, view_sampler.py:
        # 62-75): seed from the MEAN camera center; the first selected view is
        # the one farthest from it, and all n selections come from the loop.
        dists = np.linalg.norm(centers - centers.mean(axis=0), axis=1)
        selected = []
        iters = n
    else:
        selected = [start_idx]
        dists = np.linalg.norm(centers - centers[start_idx], axis=1)
        iters = n - 1
    for _ in range(iters):
        nxt = int(np.argmax(dists))
        selected.append(nxt)
        dists = np.minimum(dists, np.linalg.norm(centers - centers[nxt], axis=1))
    return np.asarray(selected, dtype=int)

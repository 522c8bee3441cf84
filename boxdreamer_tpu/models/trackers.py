"""Optional point-tracker / feature-matcher wrappers (gated heavy deps).

Equivalents of the reference's optional modules:
  * CoTracker wrapper (src/models/modules/tracker/cotracker.py:5-91) —
    torch.hub 'cotracker2' grid tracking with visibility-based match
    filtering. The reference's own forward path raises NotImplementedError
    when use_tracking is set (BoxDreamerModel.py:75); here the wrapper is
    usable standalone and the model config path raises the same error.
  * LoFTR matcher (BoxDreamerModel.py:90-93) — kornia LoFTR('indoor').

Both are host-side torch modules (they never enter the XLA program); imports
are gated, and the match-filtering logic (the only nontrivial math) is a
pure-numpy function tested without the hub models.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from boxdreamer_tpu.utils.log import INFO


def filter_visible_tracks(
    pred_tracks: np.ndarray, pred_visibility: np.ndarray
) -> np.ndarray:
    """Keep only points visible in EVERY frame of each batch item —
    the reference's CoTracker._match (cotracker.py:46-91): a point's track
    is retained iff its frame-0 visibility AND'd with every other frame's
    visibility survives.

    Args:
        pred_tracks: (B, T, N, 2) tracked point locations.
        pred_visibility: (B, T, N) boolean visibility.

    Returns:
        (B, T, M, 2) with M = number of always-visible points (per batch the
        count may differ; the result is cropped to the smallest M > 0).
    """
    tracks = np.asarray(pred_tracks)
    vis = np.asarray(pred_visibility).astype(bool)
    B, T, N = vis.shape
    keep = vis.all(axis=1)  # (B, N) visible in all frames
    counts = keep.sum(axis=1)
    m = int(counts.min()) if counts.min() > 0 else 0
    if m == 0:
        return np.zeros((B, T, 0, 2), dtype=tracks.dtype)
    out = np.zeros((B, T, m, 2), dtype=tracks.dtype)
    for b in range(B):
        idx = np.nonzero(keep[b])[0][:m]
        out[b] = tracks[b][:, idx]
    return out


class CoTrackerWrapper:
    """Gated torch.hub CoTracker ('cotracker2'). Host-side only."""

    def __init__(self, grid_size: int = 20, freeze: bool = True, device: str = "cpu"):
        self.grid_size = grid_size
        self.freeze = freeze
        self.device = device
        self._model = None

    def load_model(self):
        try:
            import torch  # noqa: PLC0415

            self._model = torch.hub.load(
                "facebookresearch/co-tracker", "cotracker2"
            ).to(self.device)
        except Exception as e:  # hub download / torch absent
            raise RuntimeError(
                "CoTracker requires torch.hub access to "
                "facebookresearch/co-tracker (unavailable here)"
            ) from e
        if self.freeze:
            self._model.eval()
            for p in self._model.parameters():
                p.requires_grad = False
        INFO("CoTracker loaded")
        return self

    def predict(
        self, video: np.ndarray, queries=None, segm_mask=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, T, C, H, W) video -> (matches (B, T, M, 2), valid (B, T, M))
        with the reference's always-visible filtering."""
        if self._model is None:
            self.load_model()
        import torch

        with torch.no_grad():
            tracks, vis = self._model(
                torch.as_tensor(video, device=self.device),
                grid_size=self.grid_size,
                segm_mask=segm_mask,
                queries=queries,
            )
        match = filter_visible_tracks(
            tracks.cpu().numpy(), vis.squeeze(-1).cpu().numpy()
        )
        return match, np.ones(match.shape[:-1], dtype=bool)


class LoFTRMatcher:
    """Gated kornia LoFTR (reference BoxDreamerModel.py:90-93:
    ``LoFTR(pretrained='indoor')``). Host-side only."""

    def __init__(self, pretrained: str = "indoor", device: str = "cpu"):
        self.pretrained = pretrained
        self.device = device
        self._model = None

    def load_model(self):
        try:
            import torch  # noqa: PLC0415
            from kornia.feature import LoFTR  # noqa: PLC0415
        except ImportError as e:
            raise RuntimeError(
                "the LoFTR matcher requires kornia (not installed); "
                "use_matching stays disabled without it"
            ) from e
        self._model = LoFTR(pretrained=self.pretrained).to(self.device).eval()
        INFO("LoFTR loaded")
        return self

    def match(
        self, img0: np.ndarray, img1: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Grayscale (H, W) pair -> (kpts0 (M, 2), kpts1 (M, 2), conf (M,))."""
        if self._model is None:
            self.load_model()
        import torch

        inp = {
            "image0": torch.as_tensor(img0, dtype=torch.float32)[None, None],
            "image1": torch.as_tensor(img1, dtype=torch.float32)[None, None],
        }
        with torch.no_grad():
            out = self._model(inp)
        return (
            out["keypoints0"].cpu().numpy(),
            out["keypoints1"].cpu().numpy(),
            out["confidence"].cpu().numpy(),
        )

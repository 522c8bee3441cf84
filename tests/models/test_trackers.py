"""Optional tracker/matcher wrapper tests (reference cotracker.py:5-91 and
BoxDreamerModel.py:44-93 surface)."""

import numpy as np
import pytest

from boxdreamer_tpu.models.trackers import (
    CoTrackerWrapper,
    LoFTRMatcher,
    filter_visible_tracks,
)


def test_filter_visible_tracks():
    """Only points visible in EVERY frame survive (cotracker._match)."""
    B, T, N = 2, 3, 5
    rng = np.random.default_rng(0)
    tracks = rng.uniform(0, 100, (B, T, N, 2))
    vis = np.ones((B, T, N), dtype=bool)
    vis[0, 1, 2] = False  # point 2 of batch 0 drops in frame 1
    vis[1, 0, 0] = False
    out = filter_visible_tracks(tracks, vis)
    assert out.shape == (2, 3, 4, 2)
    # batch 0 keeps points {0,1,3,4}
    np.testing.assert_allclose(out[0, :, 2], tracks[0, :, 3])
    # batch 1 keeps points {1,2,3,4}
    np.testing.assert_allclose(out[1, :, 0], tracks[1, :, 1])


def test_filter_all_invisible():
    tracks = np.zeros((1, 2, 3, 2))
    vis = np.zeros((1, 2, 3), dtype=bool)
    out = filter_visible_tracks(tracks, vis)
    assert out.shape == (1, 2, 0, 2)


def test_gated_errors():
    with pytest.raises(RuntimeError, match="kornia"):
        LoFTRMatcher().load_model()
    with pytest.raises(RuntimeError, match="co-tracker"):
        CoTrackerWrapper().load_model()


def test_use_tracking_config_raises():
    """Reference parity: use_tracking is a dead path that raises
    (BoxDreamerModel.py:75)."""
    from boxdreamer_tpu.models import BoxDreamerConfig

    with pytest.raises(NotImplementedError, match="Tracking"):
        BoxDreamerConfig(use_tracking=True)

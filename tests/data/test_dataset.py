import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from fixture import K_DEFAULT, CUBE_HALF, make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.data import preprocess as pp
from boxdreamer_tpu.data.loader import DataLoader, DynamicBatchSampler, collate
from boxdreamer_tpu.data.ply import read_ply_vertices
from boxdreamer_tpu.data.sampling import (
    farthest_point_sample_cameras,
    select_ref_indices,
)


@pytest.fixture(scope="module")
def linemod_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod")
    return make_linemod_fixture(str(root))


@pytest.fixture(scope="module")
def test_ds(linemod_root):
    cfg = DatasetConfig(image_size=224, length=4, sampling_strategy="uniform")
    return build_dataset("LINEMOD", cfg, "test", root=linemod_root)


def test_dataset_discovery(test_ds):
    assert len(test_ds) == 3
    assert test_ds.cat_len["ref"]["cat"] == 8
    assert "cat" in test_ds.model_paths


def test_ply_reader(test_ds):
    pts = read_ply_vertices(test_ds.model_paths["cat"])
    assert pts.shape[1] == 3
    np.testing.assert_allclose(np.abs(pts).max(), CUBE_HALF, atol=1e-6)


def test_batch_dict_contract(test_ds):
    batch = test_ds[0]
    T, S = 4, 224
    assert batch["images"].shape == (T, 3, S, S)
    assert batch["bbox_feat"].shape == (T, 8, S, S)
    assert batch["poses"].shape == (T, 4, 4)
    assert batch["intrinsics"].shape == (T, 3, 3)
    assert batch["non_ndc_intrinsics"].shape == (T, 3, 3)
    assert batch["bbox_3d"].shape == (T, 8, 3)
    assert batch["bbox_proj_crop"].shape == (T, 8, 2)
    assert batch["crop_parameters"].shape == (T, 4)
    assert batch["scale"].shape == (T, 3)
    assert int(batch["query_idx"]) == T - 1
    assert batch["cat"] == "cat"
    assert batch["images"].min() >= 0.0 and batch["images"].max() <= 1.0
    assert batch["bbox_feat"].min() >= -1.0 and batch["bbox_feat"].max() <= 1.0


def test_projected_box_center_is_in_crop(test_ds):
    """After cropping around the projected 3D box, the reprojected corners
    must lie within the crop and roughly centered."""
    batch = test_ds[0]
    S = 224
    proj = (batch["bbox_proj_crop"] + 1.0) / 2.0 * S  # back to pixels
    center = proj.mean(axis=1)  # (T, 2)
    # The object is centered in the crop by construction.
    assert np.all(np.abs(center - S / 2) < S * 0.2), center
    assert proj.min() > -S and proj.max() < 2 * S


def test_intrinsics_consistency(test_ds):
    """non_ndc K projections of the 3D box equal the stored bbox projection."""
    batch = test_ds[1]
    for t in range(4):
        proj = pp.project_points(
            batch["non_ndc_intrinsics"][t].astype(np.float64),
            batch["poses"][t].astype(np.float64),
            batch["bbox_3d"][t].astype(np.float64),
        )
        stored = (batch["bbox_proj_crop"][t] + 1.0) / 2.0 * 224
        np.testing.assert_allclose(proj, stored, atol=0.5)


def test_heatmap_numpy_matches_jax_op(test_ds):
    import jax.numpy as jnp

    from boxdreamer_tpu.ops import heatmap as hm_ops

    corners = np.random.default_rng(0).uniform(30, 190, (2, 8, 2)).astype(np.float32)
    ours = pp.make_heatmap_features_np(corners, 224, 224)
    jax_version = np.asarray(hm_ops.make_heatmap_features(jnp.asarray(corners), 224, 224))
    np.testing.assert_allclose(ours, jax_version, atol=1e-4)


def test_first_camera_mode(linemod_root):
    cfg = DatasetConfig(image_size=64, length=3, coordinate="first_camera")
    ds = build_dataset("LINEMOD", cfg, "test", root=linemod_root)
    batch = ds[0]
    np.testing.assert_allclose(batch["poses"][0], np.eye(4), atol=1e-5)
    # Undo must restore original query pose.
    restored = (
        batch["poses"][-1].astype(np.float64) @ batch["coordinate_transform"].astype(np.float64)
    )
    np.testing.assert_allclose(
        restored, batch["original_poses"][-1].astype(np.float64), atol=1e-3
    )


def test_collate_and_loader(test_ds):
    loader = DataLoader(test_ds, batch_size=2, shuffle=False)
    batch = next(iter(loader))
    assert batch["images"].shape[0] == 2
    assert batch["images"].shape[1] == 4
    assert len(batch["original_images"]) == 2


def test_threaded_loader_equivalence(test_ds):
    a = list(DataLoader(test_ds, batch_size=1, shuffle=False))
    b = list(DataLoader(test_ds, batch_size=1, shuffle=False, num_workers=2))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        np.testing.assert_allclose(x["bbox_3d"], y["bbox_3d"])


def test_select_ref_indices_uniform():
    idxs = select_ref_indices(5, 99, strategy="uniform")
    assert len(idxs) == 5
    assert idxs.min() >= 0 and idxs.max() <= 99


def test_select_ref_indices_random_unique():
    idxs = select_ref_indices(
        5, 9, strategy="random", rng=np.random.default_rng(0)
    )
    assert len(set(idxs.tolist())) == 5


def test_select_ref_indices_fallback():
    # stride too large -> falls back but still returns the right count.
    idxs = select_ref_indices(4, 7, strategy="stride", stride=100)
    assert len(idxs) == 4
    assert idxs.max() <= 7


def test_fps_sampling_spreads_views():
    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    centers = np.stack([np.cos(ang), np.sin(ang), np.zeros(100)], axis=1)
    sel = farthest_point_sample_cameras(centers, 4)
    # FPS on a circle picks roughly opposite/quadrant points.
    angles = np.sort(ang[sel])
    gaps = np.diff(np.concatenate([angles, [angles[0] + 2 * np.pi]]))
    assert gaps.max() < np.pi * 0.8


def test_dynamic_batch_sampler_token_budget():
    s = DynamicBatchSampler(
        dataset_len=100, base_batch_size=8, base_length=6, min_length=3,
        max_length=9, seed=0,
    )
    for L, batch in s:
        assert abs(len(batch) * L - 48) <= max(L, 8)


def test_error_retry(test_ds, monkeypatch):
    calls = {"n": 0}
    orig = test_ds.get_item

    def flaky(idx):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("corrupt sample")
        return orig(idx)

    monkeypatch.setattr(test_ds, "get_item", flaky)
    batch = test_ds[0]
    assert batch["images"].shape[0] == 4
    assert calls["n"] == 2

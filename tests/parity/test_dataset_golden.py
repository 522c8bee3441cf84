"""End-to-end data-layer golden parity: execute the REAL reference
LINEMOD_BoxDreamer dataset (/root/reference/src/datasets/linemod.py +
base.py process_data, 988 LoC) on the synthetic LINEMOD fixture and
assert our ``data/`` pipeline emits the same batch dict — images after
crop/pad/resize, NDC + non-NDC intrinsics, normalized poses, crop
parameters, 3D box corners, projected corners, and bb8 heatmap features.

This covers the full orchestration (projected-box replacement of the
detection box, bbox-driven padding + intrinsic adjustment, the NDC
round-trip through pytorch3d camera conventions, normalize_cameras in
'object' coordinates) in one shot, on top of the per-function goldens in
test_preprocess_golden.py.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from fixture import (  # noqa: E402
    make_co3d_fixture,
    make_linemod_fixture,
    make_objaverse_fixture,
    make_lmo_fixture,
    make_moped_fixture,
    make_onepose_fixture,
    make_ycbv_fixture,
)

from tests.parity import refshim

from boxdreamer_tpu.data import DatasetConfig, build_dataset

LENGTH = 3  # 2 uniform refs from the 8 train frames + 1 test query


class _Cfg(dict):
    """Attribute-access dict standing in for omegaconf.DictConfig (the
    reference reads config both ways: config.image_size and config.get)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e
        return _Cfg(v) if isinstance(v, dict) and not isinstance(v, _Cfg) else v


def _ref_base_config():
    # Mirrors configs/datamodule/test.yaml base_config with the repo's
    # default eval settings (coordinate 'object', bb8/heatmap, f32).
    return _Cfg(
        image_size=224,
        length=LENGTH,
        dynamic_length=False,
        stride=1,
        dynamic_stride=False,
        random_stride=False,
        uniform_sampling=True,
        fps_sampling=False,
        pose_augmentation=False,
        mask_augmentation=False,
        intri_augmentation=False,
        compute_optical=True,
        max_norm=False,
        precision="32",
        coordinate="object",
        use_bbox=True,
        use_mask=False,
        mask_bg=True,
        pose_representation="bb8",
        bbox_representation="heatmap",
        augmentation=_Cfg(
            rgb_augmethods=None,
            obj_truncation_ratio=0.3,
            obj_mask_ratio=0.3,
            enable_image_rotation=False,
        ),
    )


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return make_linemod_fixture(str(tmp_path_factory.mktemp("lm_golden")))


@pytest.fixture(scope="module")
def ref_item(fixture_root):
    lm = refshim.load("src.datasets.linemod")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=fixture_root,
        cat_filter=None,
        model_suffix=None,
        reference_suffix=None,
    )
    ds = lm.LINEMOD_BoxDreamer(cfg, "test")
    assert len(ds) == 3
    return ds[(0, None)]


@pytest.fixture(scope="module")
def our_item(fixture_root):
    cfg = DatasetConfig(
        image_size=224,
        length=LENGTH,
        sampling_strategy="uniform",
        coordinate="object",
        precision="float32",
    )
    ds = build_dataset("LINEMOD", cfg, "test", root=fixture_root)
    return ds.get_item(0)


def _t2n(x):
    return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) else np.asarray(x)


def test_batch_keys_superset(ref_item, our_item):
    """Every array key the reference emits exists here (base.py:725-752)."""
    expected = {
        "images", "intrinsics", "non_ndc_intrinsics", "original_intrinsics",
        "poses", "original_poses", "coordinate_transform", "scale",
        "crop_parameters", "image_masks", "original_shape", "bbox_3d",
        "bbox_3d_original", "bbox_proj_crop", "bbox_feat", "cat",
        "query_idx", "dataset", "original_images", "model_path",
    }
    assert expected <= set(ref_item.keys())
    assert expected <= set(our_item.keys())


def test_sequence_selection_matches(ref_item, our_item):
    """Uniform ref sampling + query-last ordering pick the same files."""
    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    assert int(ref_item["query_idx"]) == int(our_item["query_idx"])
    assert ref_item["dataset"] == our_item["dataset"]
    assert ref_item["cat"] == our_item["cat"]


@pytest.mark.parametrize(
    "key,atol",
    [
        # Ours resizes the uint8 PIL crop then scales to [0,1]; the
        # reference converts to float first (ToTensor -> Resize). The
        # uint8 intermediate rounds each source pixel by <= 0.5/255, so
        # outputs can differ by ~1/255 — geometry is bit-matched above.
        ("images", 4.5e-3),
        ("image_masks", 1e-6),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("original_intrinsics", 1e-3),
        ("poses", 1e-5),
        ("original_poses", 1e-6),
        ("coordinate_transform", 1e-6),
        ("scale", 1e-6),
        ("crop_parameters", 1e-4),
        ("original_shape", 0.0),
        ("bbox_3d", 1e-6),
        ("bbox_3d_original", 1e-6),
        ("bbox_proj_crop", 1e-4),
        ("bbox_feat", 2e-3),       # gaussian heatmaps, f32
    ],
)
def test_batch_value_golden(ref_item, our_item, key, atol):
    ref = _t2n(ref_item[key]).astype(np.float64)
    ours = _t2n(our_item[key]).astype(np.float64)
    if key == "image_masks":
        ref, ours = np.broadcast_arrays(ref, ours)
    assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
    np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


def test_lmo_dataset_golden(tmp_path):
    """LINEMOD-Occlusion: the REAL reference LINEMODO dataset (3x4 poses,
    xywh boxes in EVERY split, test-preprocessed tree, default intrinsics
    auto-written) vs our LINEMODOccludedDataset on the same fixture."""
    root = make_lmo_fixture(str(tmp_path / "lmo"))
    lmo = refshim.load("src.datasets.linemodo")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=root,
        cat_filter=None,
        model_suffix=None,
        reference_suffix=None,
    )
    ref_item = lmo.LINEMOD_Occulusion(cfg, "test")[(0, None)]  # [sic]

    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset("LINEMODO", ours_cfg, "test", root=root).get_item(0)

    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    for key, atol in [
        ("images", 4.5e-3),
        ("poses", 1e-5),
        ("original_poses", 1e-6),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("crop_parameters", 1e-4),
        ("bbox_3d", 1e-6),
        ("bbox_feat", 2e-3),
    ]:
        ref = _t2n(ref_item[key]).astype(np.float64)
        ours = _t2n(our_item[key]).astype(np.float64)
        assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
        np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


def test_ycbv_dataset_golden(tmp_path):
    """YCB-Video: the REAL reference YCBV dataset (xyxy boxes, points.xyz
    CAD models, same_seq reference mode for determinism) vs our
    YCBVDataset on the same fixture."""
    root = make_ycbv_fixture(str(tmp_path / "ycbv"))
    ycbv = refshim.load("src.datasets.ycbv")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=root,
        cat_filter=None,
        model_suffix=None,
        reference_suffix=None,
        ref_mode="same_seq",  # random_seq shuffles with global np.random
    )
    ref_item = ycbv.YCBV_BoxDreamer(cfg, "test")[(0, None)]

    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset(
        "YCBV", ours_cfg, "test", root=root, ref_mode="same_seq"
    ).get_item(0)

    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    for key, atol in [
        ("images", 4.5e-3),
        ("poses", 1e-5),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("crop_parameters", 1e-4),
        ("bbox_3d", 1e-6),
        ("bbox_feat", 2e-3),
    ]:
        ref = _t2n(ref_item[key]).astype(np.float64)
        ours = _t2n(our_item[key]).astype(np.float64)
        assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
        np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


@pytest.mark.parametrize("ref_mode", ["first_seq", "same_seq"])
def test_onepose_dataset_golden(tmp_path, ref_mode):
    """OnePose: the REAL reference OnePoseDataset (seq dirs, numeric file
    sort, boxes always None from reproj_box, box3d_corners.txt 3D boxes,
    first_seq reference protocol) vs our OnePoseDataset.

    same_seq uses a SINGLE sequence: the reference loads sequences on a
    thread pool and its category order is as_completed order, so with >1
    sequence the queried category is nondeterministic."""
    seqs = ("1", "2") if ref_mode == "first_seq" else ("1",)
    root = make_onepose_fixture(str(tmp_path / "op"), seqs=seqs)
    op = refshim.load("src.datasets.onepose")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=root,
        cat_filter=None,
        model_suffix=None,
        reference_suffix=None,
        ref_mode=ref_mode,
    )
    ref_ds = op.OnePoseDataset(cfg, "test")
    ref_item = ref_ds[(0, None)]

    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset(
        "OnePose", ours_cfg, "test", root=root, ref_mode=ref_mode
    ).get_item(0)

    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    assert ref_item["cat"] == our_item["cat"] == "toycar"
    for key, atol in [
        ("images", 4.5e-3),
        ("poses", 1e-5),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("crop_parameters", 1e-4),
        ("bbox_3d", 1e-6),
        ("bbox_feat", 2e-3),
    ]:
        ref = _t2n(ref_item[key]).astype(np.float64)
        ours = _t2n(our_item[key]).astype(np.float64)
        assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
        np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


def test_moped_dataset_golden(tmp_path):
    """MOPED: the REAL reference MOPED_BoxDreamer (per-sequence categories
    'test-<obj>-<seq>', same-split refs, inclusive mask-derived boxes,
    per-sequence .ply models) vs our MOPEDDataset."""
    root = make_moped_fixture(str(tmp_path / "moped"))
    mp = refshim.load("src.datasets.moped")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=root,
        cat_filter=None,
        ref_mode="same_seq",
    )
    # Query index 1: the uniform ref pick is [0, 2], so the query is NOT
    # among its own references — index 0 would trigger the reference's
    # random backfill (base.py:863-874) and break determinism.
    ref_item = mp.MOPED_BoxDreamer(cfg, "test")[(1, None)]

    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset(
        "MOPED", ours_cfg, "test", root=root, ref_mode="same_seq"
    ).get_item(1)

    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    assert ref_item["cat"] == our_item["cat"] == "test-toy-00"
    for key, atol in [
        ("images", 4.5e-3),
        ("poses", 1e-5),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("crop_parameters", 1e-4),
        ("bbox_3d", 1e-6),
        ("bbox_feat", 2e-3),
    ]:
        ref = _t2n(ref_item[key]).astype(np.float64)
        ours = _t2n(our_item[key]).astype(np.float64)
        assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
        np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


def test_co3d_dataset_golden(tmp_path):
    """CO3D-v2: the REAL reference Co3DV2Dataset (selected-frame metadata,
    npz camera_pose/camera_intrinsics one-time txt conversion, mask-derived
    exclusive boxes, cam2world pose inversion, raw pointcloud.ply models)
    vs our CO3DDataset. Query index 1 avoids the random ref backfill."""
    root = make_co3d_fixture(str(tmp_path / "co3d"))
    co3d = refshim.load("src.datasets.co3d")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=root,
    )
    ref_item = co3d.Co3DV2Dataset(cfg, "test")[(1, None)]

    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset("CO3D", ours_cfg, "test", root=root).get_item(1)

    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    for key, atol in [
        ("images", 4.5e-3),
        ("poses", 1e-5),
        ("original_poses", 1e-6),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("crop_parameters", 1e-4),
        ("bbox_3d", 1e-6),
        ("bbox_feat", 2e-3),
    ]:
        ref = _t2n(ref_item[key]).astype(np.float64)
        ours = _t2n(our_item[key]).astype(np.float64)
        assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
        np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


def test_co3d_npz_conversion_interops(tmp_path):
    """Our one-time npz->txt conversion must be consumable by the
    reference (and vice versa — the golden above covers that direction):
    run OUR dataset first so it writes the txt files, then the reference."""
    root = make_co3d_fixture(str(tmp_path / "co3d2"))
    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset("CO3D", ours_cfg, "test", root=root).get_item(1)

    co3d = refshim.load("src.datasets.co3d")
    cfg = _Cfg(base=_ref_base_config(), root=root)
    ref_item = co3d.Co3DV2Dataset(cfg, "test")[(1, None)]
    np.testing.assert_allclose(
        _t2n(our_item["poses"]).astype(np.float64),
        _t2n(ref_item["poses"]).astype(np.float64),
        atol=1e-5,
    )


def test_objaverse_dataset_golden(tmp_path):
    """Objaverse: the REAL reference ObjaverseBoxDreamerDataset (render-type
    categories '<obj>_<render_type>', meta-json w2c poses + per-frame
    intrinsics, RGBA alpha-mask boxes with inclusive max, bbox_3d txt
    fallback when the glb is absent) vs our ObjaverseDataset.
    Query index 1 avoids the random ref backfill (objaverse is not in the
    reference's query-can-be-ref exemption list)."""
    root = make_objaverse_fixture(str(tmp_path / "obja"))
    ob = refshim.load("src.datasets.objaverse")
    cfg = _Cfg(
        base=_ref_base_config(),
        root=root,
        subdir_num=None,
    )
    ref_item = ob.ObjaverseBoxDreamerDataset(cfg, "test")[(1, None)]

    ours_cfg = DatasetConfig(
        image_size=224, length=LENGTH, sampling_strategy="uniform",
        coordinate="object", precision="float32",
    )
    our_item = build_dataset("Objaverse", ours_cfg, "test", root=root).get_item(1)

    assert [os.path.basename(p) for p in ref_item["original_images"]] == [
        os.path.basename(p) for p in our_item["original_images"]
    ]
    for key, atol in [
        ("images", 4.5e-3),
        ("poses", 1e-5),
        ("original_poses", 1e-6),
        ("intrinsics", 1e-4),
        ("non_ndc_intrinsics", 1e-3),
        ("crop_parameters", 1e-4),
        ("bbox_3d", 1e-6),
        ("bbox_feat", 2e-3),
    ]:
        ref = _t2n(ref_item[key]).astype(np.float64)
        ours = _t2n(our_item[key]).astype(np.float64)
        assert ref.shape == ours.shape, f"{key}: {ref.shape} vs {ours.shape}"
        np.testing.assert_allclose(ours, ref, atol=atol, err_msg=key)


def test_pca_bbox3d_matches_reference(tmp_path):
    """co3d/moped 3D boxes are PCA-aligned (reference prepare_bbox3d,
    bbox_utils.py:139-160). Execute the real function on a deliberately
    rotated, anisotropic cloud and compare our PCA branch."""
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)) * np.array([0.09, 0.04, 0.02])
    ang = 0.7
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1.0],
        ]
    )
    pts = pts @ R.T + np.array([0.05, -0.02, 0.4])
    ply = tmp_path / "blob.ply"
    with open(ply, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
        )
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")

    bu = refshim.load("src.datasets.utils.base.bbox_utils")
    theirs = bu.prepare_bbox3d(str(ply), "blob", dataset="moped", split="test")

    from boxdreamer_tpu.data import preprocess as pp
    from boxdreamer_tpu.data.ply import read_ply_vertices

    ours = pp.pca_bbox_corners(read_ply_vertices(str(ply)))
    np.testing.assert_allclose(ours, theirs, atol=1e-9)

    # The PIPELINE must stay axis-aligned: the reference's only
    # prepare_bbox3d call site passes no dataset (base.py:436), so the PCA
    # branch never runs in process_data.
    axis = bu.prepare_bbox3d(str(ply), "blob", split="test")
    np.testing.assert_allclose(
        pp.bbox_corners_from_points(read_ply_vertices(str(ply))), axis, atol=1e-9
    )


def test_images_are_real_pixels(ref_item):
    """Guard against a degenerate fixture (all-constant crops would make
    the image comparison vacuous)."""
    imgs = _t2n(ref_item["images"])
    assert imgs.std() > 0.05 and imgs.max() <= 1.0 and imgs.min() >= 0.0

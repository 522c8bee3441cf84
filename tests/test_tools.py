"""Tool CLI tests: view sampler, BOP converter, safetensors export."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from fixture import K_DEFAULT, look_at_pose, make_linemod_fixture  # noqa: E402


def test_view_sampler_builds_fps_db(tmp_path):
    from boxdreamer_tpu.data import DatasetConfig, build_dataset
    from boxdreamer_tpu.tools.view_sampler import build_linemod_reference_db

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=8, n_test=2)
    out = build_linemod_reference_db(root, num=4, method="fps")
    assert os.path.isdir(os.path.join(out, "cat"))
    files = os.listdir(os.path.join(out, "cat"))
    assert sum(f.endswith("-color.png") for f in files) == 4
    # The adapter consumes it via reference_suffix.
    cfg = DatasetConfig(image_size=64, length=4)
    ds = build_dataset(
        "LINEMOD", cfg, "test", root=root, reference_suffix="_fps_4"
    )
    assert ds.cat_len["ref"]["cat"] == 4
    batch = ds[0]
    assert batch["images"].shape == (4, 3, 64, 64)


def make_bop_fixture(root, n_frames=3):
    scene = os.path.join(root, "test", "000001")
    os.makedirs(os.path.join(scene, "rgb"), exist_ok=True)
    gt, cam, info = {}, {}, {}
    for i in range(n_frames):
        Image.new("RGB", (64, 48), (40, 40, 40)).save(
            os.path.join(scene, "rgb", f"{i:06d}.png")
        )
        pose = look_at_pose(i * 1.0)
        gt[str(i)] = [
            {
                "obj_id": 5,
                "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
                "cam_t_m2c": (pose[:3, 3] * 1000).tolist(),
            }
        ]
        cam[str(i)] = {"cam_K": K_DEFAULT.reshape(-1).tolist()}
        info[str(i)] = [{"bbox_visib": [10, 12, 20, 16]}]
    for name, data in (("scene_gt", gt), ("scene_camera", cam), ("scene_gt_info", info)):
        with open(os.path.join(scene, f"{name}.json"), "w") as f:
            json.dump(data, f)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    from fixture import write_cube_ply

    write_cube_ply(os.path.join(root, "models", "obj_000005.ply"))
    return root


def test_bop_converter(tmp_path):
    from boxdreamer_tpu.tools.bop_convert import main

    bop = make_bop_fixture(str(tmp_path / "bop"))
    out = str(tmp_path / "converted")
    assert main(["--bop-root", bop, "--split", "test", "--output", out]) == 0
    # Frames nest per scene: <split>/<obj>/<scene>/<im>-* (the reference
    # YCBV loader's required sequence layout).
    obj_dir = os.path.join(out, "test", "obj_000005", "000001")
    files = sorted(os.listdir(obj_dir))
    assert "000000-color.png" in files
    pose = np.loadtxt(os.path.join(obj_dir, "000000-pose.txt"))
    np.testing.assert_allclose(pose, look_at_pose(0.0), atol=1e-6)  # mm->m undone
    box = np.loadtxt(os.path.join(obj_dir, "000000-box.txt"))
    np.testing.assert_allclose(box, [10, 12, 30, 28])
    assert os.path.exists(
        os.path.join(out, "models", "obj_000005", "obj_000005.ply")
    )


def test_safetensors_name_roundtrip():
    """flax->reference-name export feeds back through the importer."""
    from boxdreamer_tpu.models import BETR, BETRConfig
    from boxdreamer_tpu.models import weights as W
    from boxdreamer_tpu.tools.export_safetensors import flax_to_reference_names

    import jax
    import jax.numpy as jnp

    cfg = BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    )
    model = BETR(cfg)
    pose_feat = jnp.zeros((1, 2, 8, 28, 28))
    tokens = jnp.zeros((1, 2, 4, 32))
    masks = jnp.zeros((1, 2), dtype=bool).at[:, 1].set(True)
    params = model.init(jax.random.PRNGKey(0), pose_feat, None, masks, tokens)

    flat = flax_to_reference_names({"params": {"decoder": params["params"]}})
    assert any(k.startswith("BoxDreamer.decoder.attn.0.") for k in flat)
    # Re-import through the converter and compare outputs.
    converted = W.convert_betr(flat, cfg, prefix="BoxDreamer.decoder.")
    merged = W.merge_params(params["params"], converted)
    out1 = model.apply(params, pose_feat, None, masks, tokens)
    out2 = model.apply({"params": merged}, pose_feat, None, masks, tokens)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_foundationpose_ref_converter(tmp_path):
    from boxdreamer_tpu.tools.foundationpose_refs import main as fp_main

    fp_root = tmp_path / "fp"
    obj = fp_root / "002_master_chef_can"
    (obj / "rgb").mkdir(parents=True)
    (obj / "cam_in_ob").mkdir()
    np.savetxt(obj / "K.txt", K_DEFAULT)
    for i in range(3):
        Image.new("RGB", (64, 48), (30, 30, 30)).save(obj / "rgb" / f"{i}.png")
        cam_in_ob = np.linalg.inv(look_at_pose(i * 0.7))
        np.savetxt(obj / "cam_in_ob" / f"{i}.txt", cam_in_ob)
    out = tmp_path / "ycbv"
    assert fp_main(["--fp-root", str(fp_root), "--output", str(out)]) == 0
    ref_dir = out / "train_foundationpose" / "002_master_chef_can"
    files = sorted(os.listdir(ref_dir))
    assert "0000-color.png" in files and "0000-pose.txt" in files
    pose = np.loadtxt(ref_dir / "0000-pose.txt")
    np.testing.assert_allclose(pose, look_at_pose(0.0), atol=1e-8)
    # Consumable by the YCBV adapter as a reference suffix.
    from boxdreamer_tpu.data import DatasetConfig, build_dataset

    test_dir = out / "test" / "002_master_chef_can"
    test_dir.mkdir(parents=True)
    for i in range(2):
        pose = look_at_pose(i * 1.1)
        base = str(test_dir / f"{i:06d}")
        Image.new("RGB", (64, 48), (30, 30, 30)).save(base + "-color.png")
        np.savetxt(base + "-pose.txt", pose)
        np.savetxt(base + "-intrinsics.txt", K_DEFAULT)
        np.savetxt(base + "-box.txt", np.array([5, 5, 40, 40]))
    ds = build_dataset(
        "YCBV", DatasetConfig(image_size=32, length=3), "test",
        root=str(out), reference_suffix="_foundationpose", ref_mode="random_seq",
    )
    assert ds.cat_len["ref"]["002_master_chef_can"] == 3


def _look_at(theta, radius=1.0, z=0.4):
    """World->cam pose of a camera on a circle looking at the origin."""
    c = np.array([radius * np.cos(theta), radius * np.sin(theta), z])
    fwd = -c / np.linalg.norm(c)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    R_c2w = np.stack([right, true_up, fwd], axis=1)
    pose = np.eye(4)
    pose[:3, :3] = R_c2w.T
    pose[:3, 3] = -R_c2w.T @ c
    return pose


def _write_seq(seq_dir, thetas):
    os.makedirs(seq_dir, exist_ok=True)
    for i, th in enumerate(thetas):
        stem = os.path.join(seq_dir, f"{i:06d}")
        pose = _look_at(th)
        np.savetxt(stem + "-pose.txt", pose)
        np.savetxt(stem + "-box.txt", [10, 10, 50, 50])
        np.savetxt(stem + "-intrinsics.txt", np.eye(3) * 100)
        from PIL import Image

        Image.new("RGB", (32, 32)).save(stem + "-color.png")


def test_ycbv_best_sequence_selection(tmp_path):
    """Best-sequence pick: wide angular coverage beats a clustered sequence
    (reference view_sampler.py:382-421)."""
    from boxdreamer_tpu.tools.view_sampler import (
        build_ycbv_reference_db,
        select_best_sequence,
    )

    root = str(tmp_path)
    obj = os.path.join(root, "ref_views_16_processed", "obj01")
    _write_seq(os.path.join(obj, "0000"), np.linspace(0, 0.15, 6))  # clustered
    _write_seq(os.path.join(obj, "0001"), np.linspace(0, 2 * np.pi, 6, endpoint=False))

    best, ranked = select_best_sequence(obj)
    assert best == "0001"
    assert ranked[0][1] > ranked[1][1] > 0

    out = build_ycbv_reference_db(root, num=3, method="fps", link=False)
    seq_dir = os.path.join(out, "obj01", "0001")
    assert os.path.isdir(seq_dir)
    colors = [f for f in os.listdir(seq_dir) if f.endswith("-color.png")]
    assert len(colors) == 3
    assert os.path.exists(os.path.join(out, "obj_seq_mapping.txt"))
    assert "obj01 0001" in open(os.path.join(out, "obj_seq_mapping.txt")).read()
    # every copied frame has its sidecar files
    for c in colors:
        stem = c[: -len("-color.png")]
        for suf in ("-pose.txt", "-box.txt", "-intrinsics.txt"):
            assert os.path.exists(os.path.join(seq_dir, stem + suf))


def test_ycbv_first_mode(tmp_path):
    from boxdreamer_tpu.tools.view_sampler import build_ycbv_reference_db

    root = str(tmp_path)
    obj = os.path.join(root, "ref_views_16_processed", "obj01")
    _write_seq(os.path.join(obj, "0000"), np.linspace(0, 0.1, 4))
    _write_seq(os.path.join(obj, "0001"), np.linspace(0, 2 * np.pi, 4, endpoint=False))
    out = build_ycbv_reference_db(root, num=2, method="uniform", mode="first", link=False)
    assert os.path.isdir(os.path.join(out, "obj01", "0000"))


def test_onepose_reference_db(tmp_path):
    """OnePose builder: seq -1 subsampled into the 4 data dirs, other seqs
    symlinked whole, box3d_corners.txt copied (view_sampler.py:220-315)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from test_adapters import make_onepose  # reuse the adapter fixture

    from boxdreamer_tpu.tools.view_sampler import build_onepose_reference_db

    root = make_onepose(str(tmp_path), n=6)
    # the fixture lacks reproj_box; builder must tolerate missing files
    out = build_onepose_reference_db(root, num=3, method="fps", link=False)
    obj_dir = os.path.join(out, "0408-box")
    assert os.path.exists(os.path.join(obj_dir, "box3d_corners.txt"))
    # seq 1 subsampled
    seq1 = os.path.join(obj_dir, "box-1")
    assert len(os.listdir(os.path.join(seq1, "color"))) == 3
    assert len(os.listdir(os.path.join(seq1, "poses_ba"))) == 3
    # seq 2 symlinked whole
    seq2 = os.path.join(obj_dir, "box-2")
    assert os.path.islink(seq2)
    assert len(os.listdir(os.path.join(seq2, "color"))) == 6


def test_fps_mean_start_matches_reference_semantics():
    """query_idx=-1 FPS: first pick is the camera farthest from the mean
    center (reference _fps_sample, view_sampler.py:62-75)."""
    from boxdreamer_tpu.data.sampling import farthest_point_sample_cameras

    centers = np.array(
        [[0, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 0, 0], [0, 0.1, 0]], dtype=float
    )
    idxs = farthest_point_sample_cameras(centers, 3, start_idx=-1)
    assert idxs[0] == 3  # farthest from the mean
    assert len(set(idxs.tolist())) == 3


def test_lmo_preprocess(tmp_path):
    """linemod_o_process semantics: per-object-name dirs, bbox_obj boxes,
    mm->m poses (reference linemod_o_process.py:1-91)."""
    import json

    from PIL import Image

    from boxdreamer_tpu.tools.bop_convert import convert_lmo

    scene = os.path.join(str(tmp_path), "test", "000002")
    os.makedirs(os.path.join(scene, "rgb"))
    R = np.eye(3).flatten().tolist()
    scene_gt = {
        "3": [
            {"obj_id": 1, "cam_R_m2c": R, "cam_t_m2c": [100.0, 0.0, 500.0]},
            {"obj_id": 6, "cam_R_m2c": R, "cam_t_m2c": [0.0, 50.0, 700.0]},
        ]
    }
    scene_info = {
        "3": [{"bbox_obj": [10, 20, 30, 40]}, {"bbox_obj": [5, 6, 7, 8]}]
    }
    json.dump(scene_gt, open(os.path.join(scene, "scene_gt.json"), "w"))
    json.dump(scene_info, open(os.path.join(scene, "scene_gt_info.json"), "w"))
    Image.new("RGB", (64, 48)).save(os.path.join(scene, "rgb", "000003.png"))

    out = convert_lmo(str(tmp_path), link=False)
    assert sorted(os.listdir(out)) == ["ape", "cat"]
    pose = np.loadtxt(os.path.join(out, "ape", "000003-pose.txt"))
    np.testing.assert_allclose(pose[:, 3], [0.1, 0.0, 0.5])  # mm -> m
    box = np.loadtxt(os.path.join(out, "cat", "000003-box.txt"))
    np.testing.assert_allclose(box, [5, 6, 7, 8])
    assert os.path.exists(os.path.join(out, "ape", "000003-color.png"))


def test_objaverse_pose_sampling():
    """Spherical-shell sampling + look-at pose math (reference
    rendering.py:49-137 without bpy)."""
    from boxdreamer_tpu.tools import objaverse_render as orender

    rng = np.random.default_rng(0)
    for _ in range(20):
        p = orender.sample_spherical_shell(rng, 1.5, 2.2, maxz=1.0, minz=-0.5)
        r = np.linalg.norm(p)
        assert 1.5 <= r <= 2.2 and -0.5 < p[2] < 1.0
    poses = orender.sample_camera_poses(8, seed=1)
    for pose in poses:
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0.99
        # the origin projects onto the optical axis at positive depth
        origin_cam = (pose @ np.array([0, 0, 0, 1.0]))[:3]
        assert origin_cam[2] > 0
        np.testing.assert_allclose(origin_cam[:2], 0, atol=1e-10)


def test_objaverse_intrinsics_formula():
    from boxdreamer_tpu.tools.objaverse_render import camera_intrinsics

    K = camera_intrinsics(512, 512, focal_length_mm=35.0, sensor_width_mm=32.0)
    np.testing.assert_allclose(K[0, 0], 35.0 * 512 / 32.0)  # 560
    np.testing.assert_allclose(K[:2, 2], [256, 256])


def test_objaverse_render_layout(tmp_path):
    """Full output layout with an injected fake renderer; bpy path is a clean
    gated error."""
    from PIL import Image

    from boxdreamer_tpu.tools.objaverse_render import render_object

    calls = {}

    def fake_renderer(object_file, rgb_paths, poses, K, size):
        calls["n"] = len(rgb_paths)
        for p in rgb_paths:
            Image.new("RGB", size).save(p)

    out = str(tmp_path / "render")
    render_object("model.glb", 5, out, renderer=fake_renderer, seed=3)
    assert calls["n"] == 5
    assert len(os.listdir(os.path.join(out, "rgb"))) == 5
    assert len(os.listdir(os.path.join(out, "camera_pose"))) == 5
    pose = np.load(os.path.join(out, "camera_pose", "000.npy"))
    assert pose.shape == (3, 4)
    K = np.load(os.path.join(out, "intrinsics", "000.npy"))
    assert K.shape == (3, 3)
    import json

    meta = json.load(open(os.path.join(out, "metadata.json")))
    assert meta["num_renders"] == 5

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="bpy"):
        render_object("model.glb", 1, str(tmp_path / "r2"))


def test_objaverse_manifest_and_download(tmp_path):
    from boxdreamer_tpu.tools.objaverse_render import download_objects, load_manifest

    m1 = tmp_path / "m.json"
    m1.write_text('["uid1", "uid2"]')
    assert load_manifest(str(m1)) == ["uid1", "uid2"]
    m2 = tmp_path / "m.txt"
    m2.write_text("uidA\nuidB\n")
    assert load_manifest(str(m2)) == ["uidA", "uidB"]

    got = download_objects(
        ["u1"], str(tmp_path / "dl"), fetcher=lambda u: {x: f"/fake/{x}.glb" for x in u}
    )
    assert got == {"u1": "/fake/u1.glb"}

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="objaverse"):
        download_objects(["u1"], str(tmp_path / "dl2"))

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
    obj_dir = os.path.join(out, "test", "obj_000005")
    files = sorted(os.listdir(obj_dir))
    assert "000001_000000-color.png" in files
    pose = np.loadtxt(os.path.join(obj_dir, "000001_000000-pose.txt"))
    np.testing.assert_allclose(pose, look_at_pose(0.0), atol=1e-6)  # mm->m undone
    box = np.loadtxt(os.path.join(obj_dir, "000001_000000-box.txt"))
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

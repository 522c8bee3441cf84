"""Tests for the checkpoint-surgery, figure, and wandb-sync tools
(reference scripts/tools/{model_clean,model_rename,model_warpper,
draw_grid,draw_comparision_fig,wandb/wandb_sync}.py equivalents)."""

import json
import os

import numpy as np
import pytest

from boxdreamer_tpu.tools import checkpoint_tools as ct


def _flat():
    return {
        "params.encoder.w": np.ones((2, 3), np.float32),
        "params.encoder.b": np.zeros((3,), np.float32),
        "params.decoder.w": np.full((4,), 2.0, np.float32),
        "opt_state.mu.encoder.w": np.ones((2, 3), np.float32),
        "step": np.array(7),
    }


def test_clean_params_strips_optimizer_state():
    cleaned = ct.clean_params(_flat())
    assert set(cleaned) == {"encoder.w", "encoder.b", "decoder.w"}


def test_rename_keys_prefix_and_regex():
    flat = {"model.a.weight": np.zeros(1), "model.b.weight": np.zeros(1)}
    out = ct.rename_keys(
        flat, strip_prefix="model.", add_prefix="net.",
        subs=[(r"\.weight$", ".w")],
    )
    assert list(out) == ["net.a.w", "net.b.w"]


def test_rename_collision_raises():
    flat = {"a.x": np.zeros(1), "b.x": np.zeros(1)}
    with pytest.raises(ValueError, match="collision"):
        ct.rename_keys(flat, subs=[(r"^[ab]", "c")])


def test_split_parts_groups_by_prefix():
    parts = ct.split_parts(_flat())
    assert set(parts) == {"params", "opt_state", "step"}
    assert set(parts["params"]) == {"encoder.w", "encoder.b", "decoder.w"}


def test_format_structure_mentions_groups():
    s = ct.format_structure(_flat())
    assert "5 tensors" in s and "params: 3 tensors" in s
    assert "(2, 3) float32" in s


def test_checkpoint_tools_cli_roundtrip(tmp_path, capsys):
    from safetensors.numpy import load_file, save_file

    src = str(tmp_path / "ckpt.safetensors")
    save_file(_flat(), src)

    assert ct.main(["clean", src]) == 0
    cleaned = load_file(str(tmp_path / "ckpt_clean.safetensors"))
    assert set(cleaned) == {"encoder.w", "encoder.b", "decoder.w"}

    out = str(tmp_path / "renamed.safetensors")
    assert ct.main([
        "rename", src, "--output", out, "--sub", r"^params\.", "p.",
    ]) == 0
    assert "params.encoder.w -> p.encoder.w" in capsys.readouterr().out
    assert "p.decoder.w" in load_file(out)

    assert ct.main(["split", src, "--out-dir", str(tmp_path / "parts")]) == 0
    assert sorted(os.listdir(tmp_path / "parts")) == [
        "opt_state.safetensors", "params.safetensors", "step.safetensors",
    ]

    assert ct.main(["inspect", src]) == 0
    assert "top-level groups" in capsys.readouterr().out


def test_rename_dry_run_writes_nothing(tmp_path):
    from safetensors.numpy import save_file

    src = str(tmp_path / "c.safetensors")
    save_file({"a.w": np.zeros(1, np.float32)}, src)
    assert ct.main(["rename", src, "--add-prefix", "x.", "--dry-run"]) == 0
    assert not os.path.exists(str(tmp_path / "c_renamed.safetensors"))


# ---------------------------------------------------------------------------
# figures
# ---------------------------------------------------------------------------


def _png(path, color, size=(24, 24)):
    from PIL import Image

    Image.new("RGB", size, color).save(path)
    return str(path)


def test_quad_grid_renders(tmp_path):
    from boxdreamer_tpu.tools import figures

    imgs = [_png(tmp_path / f"{i}.png", (50 * i, 20, 20)) for i in range(4)]
    out = figures.quad_grid(imgs, ["a", "", "c", ""], str(tmp_path / "q.png"))
    assert os.path.getsize(out) > 1000


def test_quad_grid_selection_json(tmp_path, capsys):
    from boxdreamer_tpu.tools import figures

    imgs = [_png(tmp_path / f"{i}.png", (10, 10, 10)) for i in range(2)]
    sel = tmp_path / "sel.json"
    sel.write_text(json.dumps({"image_paths": imgs, "image_descs": ["x", "y"]}))
    out = str(tmp_path / "g.png")
    assert figures.main(["quad", "--selection", str(sel), "--output", out]) == 0
    assert os.path.exists(out)


def test_comparison_grid_file_matching_and_render(tmp_path):
    from boxdreamer_tpu.tools import figures

    # Reference crop-results layout: {root}/{scene}/croped/{frameid}-...-{method}-cropresults.png
    for scene in ["cat", "duck"]:
        d = tmp_path / scene / "croped"
        d.mkdir(parents=True)
        for method in ["ours", "gen6d"]:
            _png(d / f"42-x-{method}-cropresults.png", (90, 90, 90))
    found = figures.find_crop_result(str(tmp_path / "cat" / "croped"), "42", "ours")
    assert found and found.endswith("42-x-ours-cropresults.png")
    assert figures.find_crop_result(str(tmp_path / "cat" / "croped"), "7", "ours") is None

    out = figures.comparison_grid(
        str(tmp_path), ["cat", "duck"], ["42", "42"], ["ours", "gen6d"],
    )
    assert os.path.exists(out)
    assert os.path.exists(os.path.splitext(out)[0] + ".pdf")


# ---------------------------------------------------------------------------
# wandb sync
# ---------------------------------------------------------------------------


def test_wandb_sync_missing_root(tmp_path, capsys):
    from boxdreamer_tpu.tools import wandb_sync

    assert wandb_sync.main([str(tmp_path / "nope")]) == 1


def test_wandb_sync_gates_on_cli(tmp_path, monkeypatch):
    from boxdreamer_tpu.tools import wandb_sync

    monkeypatch.setattr(wandb_sync.shutil, "which", lambda _: None)
    assert wandb_sync.main([str(tmp_path)]) == 1


def test_wandb_sync_once(tmp_path, monkeypatch):
    from boxdreamer_tpu.tools import wandb_sync

    calls = []
    monkeypatch.setattr(wandb_sync.shutil, "which", lambda _: "/usr/bin/wandb")
    monkeypatch.setattr(
        wandb_sync, "sync_once", lambda root, proxy=None: calls.append(root) or ("ok", "")
    )
    assert wandb_sync.main([str(tmp_path), "--once"]) == 0
    assert calls == [str(tmp_path)]


def test_metric_curves_cli(tmp_path):
    """draw_plot_fig.py parity: parameterized metric-vs-refcount plot."""
    from boxdreamer_tpu.tools import figures

    spec = tmp_path / "spec.json"
    spec.write_text(
        json.dumps(
            {
                "x": [2, 4, 6, 8],
                "series": {"ADD-0.1d": [25.7, 37.6, 42.6, 50.4],
                           "Proj2D@5px": [30.7, 51.7, 57.9, 68.1]},
                "title": "Sparse View Robustness on LINEMOD",
            }
        )
    )
    out = str(tmp_path / "curves.png")
    assert figures.main(["curves", str(spec), "--output", out]) == 0
    assert os.path.getsize(out) > 1000


def test_data_analyse_cli(tmp_path):
    """data_analyse parity (ref src/utils/data_analyse.py:1-206): pose
    angle/translation stats over a registered adapter."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
    from fixture import make_linemod_fixture

    from boxdreamer_tpu.tools import data_analyse

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=8, n_test=4)
    out = str(tmp_path / "stats")
    data_analyse.main(
        [
            "--dataset", "LINEMOD", "--root", root, "--split", "test",
            "--length", "3", "--stride", "1", "--coordinate", "object",
            "--out", out,
        ]
    )
    with open(os.path.join(out, "angles.json")) as f:
        angles = json.load(f)
    with open(os.path.join(out, "translation.json")) as f:
        trans = json.load(f)
    assert angles["count"] > 0
    assert 0.0 <= angles["min"] <= angles["mean"] <= angles["max"] <= 360.0
    assert len(trans["mean"]) == 3 and len(trans["std"]) == 3
    assert os.path.exists(os.path.join(out, "angles.png"))

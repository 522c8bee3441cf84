"""Trainer driver smoke tests on the synthetic LINEMOD fixture."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.training.loss import Loss
from boxdreamer_tpu.training.metrics import MetricsConfig
from boxdreamer_tpu.training.optim import OptimConfig
from boxdreamer_tpu.training.trainer import Trainer, TrainerConfig

TINY = BoxDreamerConfig(
    betr=BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    ),
    dino=DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
        dtype="float32",
    ),
    pnp_iters=3,
)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return make_linemod_fixture(str(tmp_path_factory.mktemp("lm")), n_train=6, n_test=2)


def make_trainer(tmp_path, **overrides):
    tcfg = TrainerConfig(
        max_epochs=2,
        batch_size=2,
        num_workers=0,
        checkpoint_dir=str(tmp_path / "ckpts"),
        checkpoint_every_n_steps=2,
        log_every_n_steps=1,
        mesh_data=-1,
        mesh_model=1,
        **overrides,
    )
    return Trainer(
        BoxDreamer(TINY),
        Loss(),
        Loss(),
        OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant"),
        tcfg,
        MetricsConfig(),
    )


def test_fit_runs_and_checkpoints(fixture_root, tmp_path):
    cfg = DatasetConfig(image_size=28, length=3)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    val_ds = build_dataset("LINEMOD", cfg, "val", root=fixture_root)
    trainer = make_trainer(tmp_path)
    state = trainer.fit(train_ds, [val_ds], max_steps=4)
    assert int(state.step) == 4
    assert os.path.exists(trainer.ckpt.last_path)
    assert len(trainer._history) > 0


def test_test_loop_writes_metrics(fixture_root, tmp_path):
    cfg = DatasetConfig(image_size=28, length=3)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    test_ds = build_dataset("LINEMOD", cfg, "test", root=fixture_root)
    trainer = make_trainer(tmp_path)
    trainer.fit(train_ds, [], max_steps=1)
    out = str(tmp_path / "test_metrics.json")
    agg = trainer.test([test_ds], output_json=out)
    assert os.path.exists(out)
    assert "5cm@5degree_0" in agg


def test_grad_accumulation(fixture_root, tmp_path):
    cfg = DatasetConfig(image_size=28, length=3)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    trainer = make_trainer(tmp_path, accumulate_grad_batches=2)
    state = trainer.fit(train_ds, [], max_steps=2)
    assert int(state.step) == 2


def test_fit_with_device_bbox_feat(fixture_root, tmp_path):
    """Training with device-side bbox feature generation (loader ships only
    projections)."""
    cfg = DatasetConfig(image_size=28, length=3, device_bbox_feat=True)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    sample = train_ds[0]
    assert "bbox_feat" not in sample and "bbox_proj_pix" in sample
    trainer = make_trainer(tmp_path)
    state = trainer.fit(train_ds, [], max_steps=2)
    assert int(state.step) == 2


def test_validate_returns_pose_metric_suite(fixture_root, tmp_path):
    """Validation computes the full pose-metric suite (reference
    BoxDreamer_lightning_model.py:126-217), not just val_loss."""
    cfg = DatasetConfig(image_size=28, length=3)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    val_ds = build_dataset("LINEMOD", cfg, "val", root=fixture_root)
    trainer = make_trainer(tmp_path)
    trainer.fit(train_ds, [], max_steps=1)
    out = trainer.validate([val_ds])
    assert "val_loss" in out
    assert "val_ADD-0.1d" in out
    assert "val_proj2D@5px" in out
    assert "val_avg_err_R" in out
    assert 0.0 <= out["val_ADD-0.1d"] <= 1.0


def test_checkpoint_best_by_add(fixture_root, tmp_path):
    """monitor='val_ADD-0.1d' selects max-mode and flips the best checkpoint
    when ADD improves (VERDICT round-1 item 4)."""
    cfg = DatasetConfig(image_size=28, length=3)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    val_ds = build_dataset("LINEMOD", cfg, "val", root=fixture_root)
    trainer = make_trainer(
        tmp_path, monitor="val_ADD-0.1d", check_val_every_n_epoch=1
    )
    trainer.cfg.max_epochs = 1
    trainer.fit(train_ds, [val_ds])
    assert trainer._monitor_mode("val_ADD-0.1d") == "max"
    assert trainer._monitor_mode("val_loss") == "min"
    assert trainer.ckpt.best is not None  # best ckpt selected on ADD
    import os as _os

    assert _os.path.exists(_os.path.join(trainer.cfg.checkpoint_dir, "best"))
    # max-mode semantics: a better (higher) ADD flips best; a worse one doesn't.
    prev = trainer.ckpt.best
    assert not trainer.ckpt.maybe_save_best(trainer.state, prev - 1.0, mode="max")
    assert trainer.ckpt.maybe_save_best(trainer.state, prev + 1.0, mode="max")


def test_fit_with_encode_chunk(fixture_root, tmp_path):
    """TrainerConfig.encode_chunk: ENGAGES on a single-device mesh
    (mesh_data=1 under the 8-CPU conftest) and is auto-DISABLED on a
    multi-device mesh (the B*T reshape would cross shard boundaries);
    training steps + stays finite either way."""
    cfg = DatasetConfig(image_size=28, length=3)
    train_ds = build_dataset("LINEMOD", cfg, "train", root=fixture_root)
    val_ds = build_dataset("LINEMOD", cfg, "val", root=fixture_root)

    def run(**ov):
        tcfg = TrainerConfig(
            max_epochs=2, batch_size=2, num_workers=0,
            checkpoint_dir=str(tmp_path / "ckpts"),
            checkpoint_every_n_steps=2, log_every_n_steps=1,
            mesh_model=1, encode_chunk=2, **ov,  # 2x3=6 imgs -> 3 chunks
        )
        trainer = Trainer(
            BoxDreamer(TINY), Loss(), Loss(),
            OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant"),
            tcfg, MetricsConfig(),
        )
        state = trainer.fit(train_ds, [val_ds], max_steps=3)
        assert int(state.step) == 3
        assert np.isfinite(trainer._history[-1]["loss"])

    run(mesh_data=1)   # single device: chunked encode engages
    run(mesh_data=-1)  # 8-device mesh: gate falls back to batched encode

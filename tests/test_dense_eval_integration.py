"""Dense-mode Evaluator integration + logger/callbacks config wiring."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.models.dense import DenseConfig
from boxdreamer_tpu.training.evaluator import Evaluator

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


def test_dense_evaluator_runs(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=12, n_test=2)
    cfg = DatasetConfig(image_size=28, length=9)  # 8 refs + query
    ds = build_dataset("LINEMOD", cfg, "test", root=root)

    model = BoxDreamer(TINY)
    batch0 = ds[0]
    T = batch0["images"].shape[0]
    mask = jnp.zeros((1, T), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch0["images"])[None],
        jnp.asarray(batch0["bbox_feat"])[None],
        mask,
    )
    dense = DenseConfig(enable=True, filter_topk=4, multi_round=True,
                        sub_batch_size=2, ransac_hypotheses=8,
                        filter_enable=False)
    ev = Evaluator(model, params, batch_size=2, num_workers=0, dense_cfg=dense)
    agg = ev.run([ds], output_json=str(tmp_path / "m.json"))
    assert agg["eval size_0"]["all"] == 2
    assert "5cm@5degree_0" in agg


def test_config_groups_logger_callbacks():
    from boxdreamer_tpu.utils.builders import build_dense_config, build_logger
    from boxdreamer_tpu.utils.config import load_config

    cfg = load_config("configs", "test.yaml", overrides=["exp_name=t1"])
    assert cfg.logger.in_use == ["jsonl"]
    assert cfg.logger.log_dir == "logs/t1"
    assert cfg.callbacks.checkpoint.every_n_train_steps == 200
    d = build_dense_config(cfg)
    assert d.enable is False and d.filter_topk == 5
    cfg2 = load_config(
        "configs", "test.yaml",
        overrides=["model.modules.dense_cfg.enable=true",
                   "model.modules.dense_cfg.multi_round=true"],
    )
    d2 = build_dense_config(cfg2)
    assert d2.enable and d2.multi_round


def test_build_logger(tmp_path):
    from boxdreamer_tpu.utils.builders import build_logger
    from boxdreamer_tpu.utils.config import load_config

    cfg = load_config(
        "configs", "test.yaml", overrides=[f"logger.log_dir={tmp_path}/logs"]
    )
    lg = build_logger(cfg)
    assert lg is not None
    lg.log_metrics({"a": 1.0}, step=0)
    lg.close()
    assert os.path.exists(os.path.join(str(tmp_path), "logs", "metrics.jsonl"))

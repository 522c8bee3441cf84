"""Train/test entry point (reference run.py equivalent).

Usage (same surface as the reference's Hydra CLI):

    python run.py --config-name=train.yaml [k=v ...]
    python run.py --config-name=test.yaml datamodule.LINEMOD.root=data/lm

Differences: config composition is the built-in YAML system
(boxdreamer_tpu/utils/config.py), checkpoints are orbax directories, and
``--safetensors path`` loads reference-format weights through the
torch->flax converter (reference run.py --hf flow, run.py:154-183).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import jax


def build_everything(cfg):
    from boxdreamer_tpu.training.trainer import Trainer, TrainerConfig
    from boxdreamer_tpu.utils import builders

    model = builders.build_model(cfg)
    train_loss, test_loss = builders.build_losses(cfg)
    optim_cfg = builders.build_optim_config(cfg)
    metrics_cfg = builders.build_metrics_config(cfg)
    tcfg = TrainerConfig(
        max_epochs=int(cfg.trainer.max_epochs),
        batch_size=int(cfg.datamodule.batch_size),
        num_workers=int(cfg.datamodule.num_workers),
        accumulate_grad_batches=int(cfg.trainer.accumulate_grad_batches),
        log_every_n_steps=int(cfg.trainer.log_every_n_steps),
        checkpoint_every_n_steps=int(cfg.trainer.checkpoint_every_n_steps),
        check_val_every_n_epoch=int(cfg.trainer.check_val_every_n_epoch),
        encode_chunk=int(cfg.trainer.get("encode_chunk", 0)),
        checkpoint_dir=os.path.join("models", "checkpoints", str(cfg.exp_name)),
        mesh_data=int(cfg.trainer.mesh.data),
        mesh_model=int(cfg.trainer.mesh.model),
        seed=int(cfg.seed),
        # checkpoint-best monitor (reference configs/callbacks/default.yaml:2;
        # set callbacks.monitor='val_ADD-0.1d' for checkpoint-best-by-ADD)
        monitor=str(cfg.callbacks.get("monitor", "val_loss")),
        val_pose_metrics=bool(cfg.callbacks.get("val_pose_metrics", True)),
    )
    logger = builders.build_logger(cfg)
    trainer = Trainer(
        model, train_loss, test_loss, optim_cfg, tcfg, metrics_cfg, logger=logger
    )
    return model, trainer


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(description="BoxDreamer-TPU train/test")
    parser.add_argument("--config-name", default="test.yaml")
    parser.add_argument("--config-dir", default="configs")
    parser.add_argument("--safetensors", default=None,
                        help="reference-format safetensors weights")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    from boxdreamer_tpu.parallel import distributed
    from boxdreamer_tpu.training import checkpoint as ckpt_lib
    from boxdreamer_tpu.utils import builders
    from boxdreamer_tpu.utils.config import load_config
    from boxdreamer_tpu.utils.log import INFO

    # Multi-host (TPU pod) wiring: no-op unless JAX_COORDINATOR_ADDRESS etc.
    # are set (scripts/cluster/train_tpu.sh exports them per worker).
    distributed.initialize()

    cfg = load_config(args.config_dir, args.config_name, args.overrides)
    from boxdreamer_tpu.utils.config import print_key_configs

    print_key_configs(cfg)  # reference run.py:57
    model, trainer = build_everything(cfg)

    mode = cfg.get("mode", "test")
    INFO(f"mode={mode} devices={jax.device_count()}")

    if mode == "train":
        train_sets = builders.build_datasets(cfg, "train")
        val_sets = builders.build_datasets(cfg, "val")
        from boxdreamer_tpu.data.loader import ConcatDataset

        train_ds = train_sets[0] if len(train_sets) == 1 else ConcatDataset(train_sets)
        resume_path, how = ckpt_lib.resolve_resume(
            cfg.model.get("resume_ckpt"),
            cfg.model.get("pretrained_ckpt"),
            bool(cfg.get("resume", False)),
            bool(cfg.get("use_pretrained", False)),
        )
        trainer.fit(
            train_ds,
            val_sets,
            resume_path=resume_path if how == "resume" else None,
            pretrained_path=resume_path if how == "pretrained" else None,
            max_steps=args.max_steps,
        )
        return 0

    # test mode
    test_sets = builders.build_datasets(cfg, "test")
    import jax.numpy as jnp

    sample = test_sets[0][0]
    mask = jnp.zeros((1, sample["images"].shape[0]), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(int(cfg.seed)),
        jnp.asarray(sample["images"])[None],
        jnp.asarray(sample["bbox_feat"])[None],
        mask,
    )
    if args.safetensors:
        from boxdreamer_tpu.models import weights as W

        state = W.load_safetensors(args.safetensors)
        converted = W.convert_boxdreamer(
            state, model.config.dino, model.config.betr
        )
        params = {"params": W.merge_params(params["params"], converted["params"])}
    else:
        path, how = ckpt_lib.resolve_resume(
            cfg.model.get("resume_ckpt"),
            cfg.model.get("pretrained_ckpt"),
            True,
            bool(cfg.get("use_pretrained", True)),
        )
        if path:
            params = ckpt_lib.load_pretrained_params(path, params)

    from boxdreamer_tpu.training.evaluator import Evaluator
    from boxdreamer_tpu.utils.builders import build_metrics_config
    from boxdreamer_tpu.utils.vis import VisConfig

    ev = Evaluator(
        model,
        params,
        metrics_config=build_metrics_config(cfg),
        batch_size=int(cfg.datamodule.batch_size),
        num_workers=int(cfg.datamodule.num_workers),
        dense_cfg=builders.build_dense_config(cfg),
        # configs/model/vis group (reference configs/model/vis/default.yaml)
        vis_config=VisConfig.from_cfg(cfg.model.get("vis")),
    )
    agg = ev.run(test_sets)
    INFO(f"wrote test_metrics.json ({len(agg)} metrics)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

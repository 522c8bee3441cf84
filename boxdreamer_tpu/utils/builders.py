"""Config -> framework-object builders.

Replaces Hydra's ``instantiate`` calls in the reference's run.py:55-95 with
explicit constructors: the YAML tree (configs/) keeps the reference's key
names, and these builders map them onto the TPU framework's dataclasses.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from boxdreamer_tpu.data.base import DatasetConfig
from boxdreamer_tpu.data.registry import build_dataset
from boxdreamer_tpu.models import BETRConfig, BoxDreamer, BoxDreamerConfig, DinoViTConfig
from boxdreamer_tpu.training.loss import Loss, from_config as loss_from_config
from boxdreamer_tpu.training.metrics import MetricsConfig
from boxdreamer_tpu.training.optim import OptimConfig
from boxdreamer_tpu.utils.config import ConfigNode


def build_model(cfg: ConfigNode) -> BoxDreamer:
    m = cfg.model.modules
    dec = m.decoder
    dtype = {"bf16": "bfloat16", "32": "float32", "16": "float16"}.get(
        str(cfg.get("precision", "bf16")), "bfloat16"
    )
    betr = BETRConfig(
        d_model=dec.d_model,
        nhead=dec.nhead,
        num_decoder_layers=dec.num_decoder_layers,
        patch_size=dec.patch_size,
        img_size=dec.img_size,
        dtype=dtype,
        diff_emb=bool(dec.get("diff_emb", False)),
        # Supervision flags + ray-head variant (reference transformer.yaml
        # :22,47-48; patchify_rays lives at the modules level there and is
        # copied into the decoder config by config_utils.py:85).
        nvs_supervision=bool(dec.get("nvs_supervision", False)),
        ray_supervision=bool(dec.get("ray_supervision", True)),
        patchify_rays=bool(m.get("patchify_rays", True)),
        # TPU-native extension (no reference counterpart): opt-in int8
        # serving mode, e.g. `model.modules.decoder.quantize=int8` on the
        # CLI. Serving-only; training falls back to float math.
        quantize=dec.get("quantize", None),
    )
    dino = DinoViTConfig(
        img_size=dec.img_size, patch_size=dec.patch_size, dtype=dtype,
        # e.g. `model.modules.encoder.dino.quantize=int8` (serving-only).
        quantize=m.encoder.get(m.encoder.name, {}).get("quantize", None),
    )
    model_cfg = BoxDreamerConfig(
        encoder=m.encoder.name,
        freeze_encoder=bool(m.encoder.get(m.encoder.name, {}).get("freeze", True)),
        coordinate=m.coordinate,
        pose_representation=m.pose_representation,
        bbox_representation=m.bbox_representation,
        decode_topk=m.get("decode_topk", 20),
        pnp_iters=m.get("pnp_iters", 20),
        betr=betr,
        dino=dino,
    )
    return BoxDreamer(model_cfg)


def build_dense_config(cfg: ConfigNode):
    """dense_cfg group -> DenseConfig (reference transformer.yaml:25-34)."""
    from boxdreamer_tpu.models.dense import DenseConfig

    d = cfg.model.modules.get("dense_cfg")
    if d is None:
        return DenseConfig()
    return DenseConfig(
        enable=bool(d.get("enable", False)),
        filter_enable=bool(d.get("filter_enable", True)),
        filter=d.get("filter", "dino"),
        filter_topk=int(d.get("filter_topk", 5)),
        multi_round=bool(d.get("multi_round", False)),
        sub_batch_size=int(d.get("sub_batch_size", 5)),
        fine_level=bool(d.get("fine_level", False)),
        fine_topk=int(d.get("fine_topk", 5)),
        sequence_parallel=bool(d.get("sequence_parallel", False)),
        sp_axis=d.get("sp_axis", "data"),
        sp_min_len=int(d.get("sp_min_len", 4096)),
    )


def build_logger(cfg: ConfigNode):
    """logger group -> ExperimentLogger (reference configs/logger/default.yaml
    in_use selection, run.py:77-84)."""
    from boxdreamer_tpu.utils.logging_utils import ExperimentLogger

    lg = cfg.get("logger")
    if lg is None:
        return None
    in_use = lg.get("in_use", ["jsonl"])
    return ExperimentLogger(
        log_dir=lg.get("log_dir", "logs"),
        use_tensorboard="tensorboard" in in_use,
        use_wandb="wandb" in in_use,
        wandb_project=lg.get("wandb", {}).get("project"),
        use_csv="csv" in in_use,
        use_neptune="neptune" in in_use,
        neptune_project=lg.get("neptune", {}).get("project"),
    )


def build_losses(cfg: ConfigNode) -> Tuple[Loss, Loss]:
    lc = cfg.model.loss
    return loss_from_config(lc.train.losses), loss_from_config(lc.test.losses)


def build_optim_config(cfg: ConfigNode) -> OptimConfig:
    o = cfg.model.opt
    frozen = ("encoder",) if cfg.model.modules.encoder.name != "none" else ()
    return OptimConfig(
        optimizer=o.optimizer,
        lr=float(o.true_lr),
        adam_decay=float(o.adam_decay),
        adamw_decay=float(o.adamw_decay),
        scheduler=o.scheduler,
        mslr_milestones=tuple(o.mslr_milestones),
        mslr_gamma=float(o.mslr_gamma),
        cosa_tmax=int(o.cosa_tmax),
        cosa_eta_min=float(o.cosa_eta_min),
        elr_gamma=float(o.elr_gamma),
        use_warmup=bool(o.use_warmup),
        warmup_steps=int(o.warmup_steps),
        frozen_prefixes=frozen,
    )


def build_metrics_config(cfg: ConfigNode) -> MetricsConfig:
    m = cfg.model.metrics
    return MetricsConfig(
        metrics_list=tuple(m.metrics_list),
        t_scale=m.t_scale,
        pose_thresholds=tuple(m.pose_error.pose_thresholds),
        proj2d_thres=float(m.proj2d.proj2d_thres),
    )


def build_dataset_config(base: ConfigNode) -> DatasetConfig:
    return DatasetConfig(
        image_size=int(base.image_size),
        length=int(base.length),
        dynamic_length=tuple(base.dynamic_length) if base.get("dynamic_length") else None,
        sampling_strategy=base.get("sampling_strategy", "uniform"),
        stride=int(base.get("stride", 1)),
        dynamic_stride=bool(base.get("dynamic_stride", False)),
        min_stride=int(base.get("min_stride", 1)),
        max_stride=int(base.get("max_stride", 1)),
        coordinate=base.get("coordinate", "object"),
        pose_representation=base.get("pose_representation", "bb8"),
        bbox_representation=base.get("bbox_representation", "heatmap"),
        compute_optical=bool(base.get("compute_optical", False)),
        normalize_trans=bool(base.get("normalize_trans", False)),
        max_norm=bool(base.get("max_norm", False)),
        use_bbox=bool(base.get("use_bbox", True)),
        use_mask=bool(base.get("use_mask", False)),
        mask_bg=bool(base.get("mask_bg", True)),
        precision=base.get("precision", "float32"),
    )


_ADAPTER_KWARGS = {
    "LINEMOD": ("root", "model_suffix", "reference_suffix", "cat_filter"),
    "LINEMODO": ("root", "model_suffix", "reference_suffix", "cat_filter"),
    "OnePose": ("root",),
    "OnePose_Lowtexture": ("root",),
    "YCBV": ("root",),
    "CO3D": ("root",),
    "MOPED": ("root",),
    "Objaverse": ("root",),
    "Custom": (),
}


def build_datasets(cfg: ConfigNode, split: str) -> List:
    dm = cfg.datamodule
    names = {
        "train": dm.get("train_datasets", []),
        "val": dm.get("val_datasets", []),
        "test": dm.get("test_datasets", []),
    }[split]
    out = []
    for name in names:
        entry = dm[name]
        ds_cfg = build_dataset_config(entry.base)
        kwargs = {
            k: entry.get(k)
            for k in _ADAPTER_KWARGS.get(name, ())
            if entry.get(k) is not None
        }
        out.append(build_dataset(name, ds_cfg, split, **kwargs))
    return out

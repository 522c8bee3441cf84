"""Dataset registry (reference DATASET_REGISTRY,
src/datamodules/BoxDreamer_datamodule.py:36-44)."""

from __future__ import annotations

from typing import Callable, Dict

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig


def _linemod(config, split, **kw):
    from boxdreamer_tpu.data.adapters.linemod import LINEMODDataset

    return LINEMODDataset(config, split, **kw)


def _linemodo(config, split, **kw):
    from boxdreamer_tpu.data.adapters.linemod import LINEMODOccludedDataset

    return LINEMODOccludedDataset(config, split, **kw)


def _custom(config, split, **kw):
    from boxdreamer_tpu.data.adapters.custom import CustomDataset

    return CustomDataset(config, split, **kw)


def _onepose(config, split, **kw):
    from boxdreamer_tpu.data.adapters.onepose import OnePoseDataset

    return OnePoseDataset(config, split, **kw)


def _ycbv(config, split, **kw):
    from boxdreamer_tpu.data.adapters.ycbv import YCBVDataset

    return YCBVDataset(config, split, **kw)


def _co3d(config, split, **kw):
    from boxdreamer_tpu.data.adapters.co3d import CO3DDataset

    return CO3DDataset(config, split, **kw)


def _moped(config, split, **kw):
    from boxdreamer_tpu.data.adapters.moped import MOPEDDataset

    return MOPEDDataset(config, split, **kw)


def _objaverse(config, split, **kw):
    from boxdreamer_tpu.data.adapters.objaverse import ObjaverseDataset

    return ObjaverseDataset(config, split, **kw)


DATASET_REGISTRY: Dict[str, Callable[..., BaseDataset]] = {
    "LINEMOD": _linemod,
    "LINEMODO": _linemodo,
    "OnePose": _onepose,
    "OnePose_Lowtexture": _onepose,
    "YCBV": _ycbv,
    "CO3D": _co3d,
    "MOPED": _moped,
    "Objaverse": _objaverse,
    "Custom": _custom,
}


def build_dataset(name: str, config: DatasetConfig, split: str, **kwargs) -> BaseDataset:
    if name not in DATASET_REGISTRY:
        raise KeyError(f"Unknown dataset {name}; known: {list(DATASET_REGISTRY)}")
    return DATASET_REGISTRY[name](config, split, **kwargs)

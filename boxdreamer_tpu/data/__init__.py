"""Host-side data layer: dataset adapters, preprocessing, sampling, batching.

The reference's data layer (src/datasets/, src/datamodules/) runs per-sample
Python/PIL/torch preprocessing in DataLoader workers. Here the host pipeline
is vectorized numpy + PIL decode only; everything that can live on device
(heatmap generation, projection math) has a jax twin in boxdreamer_tpu.ops
with parity tests between the two.
"""

from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig
from boxdreamer_tpu.data.registry import DATASET_REGISTRY, build_dataset

__all__ = ["BaseDataset", "DatasetConfig", "DATASET_REGISTRY", "build_dataset"]

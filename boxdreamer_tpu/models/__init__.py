"""Model layer: DINOv2 ViT encoder, BETR decoder, and the full BoxDreamer
pose-estimation model, implemented as functional Flax modules with a bf16
compute policy and Pallas attention on TPU."""

from boxdreamer_tpu.models.betr import BETR, BETRConfig
from boxdreamer_tpu.models.dinov2 import DinoViT, DinoViTConfig
from boxdreamer_tpu.models.boxdreamer import BoxDreamer, BoxDreamerConfig

__all__ = [
    "BETR",
    "BETRConfig",
    "DinoViT",
    "DinoViTConfig",
    "BoxDreamer",
    "BoxDreamerConfig",
]

"""ResNet encoder (Flax) — the reference's alternative RGB encoder.

Equivalent of the torchvision-based ResNetWrapper
(src/models/modules/encoder/resnet.py:5-77): resnet{18,34,50} backbone whose
layer4 feature map is flattened to patch tokens for BETR. NHWC layout,
bf16-capable, with a torchvision-state-dict weight converter so pretrained
torch weights can be ported (models/weights.py conventions).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from boxdreamer_tpu.models.dinov2 import IMAGENET_MEAN, IMAGENET_STD

_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    model_type: str = "resnet18"
    dtype: str = "bfloat16"

    @property
    def block(self) -> str:
        return _SPECS[self.model_type][0]

    @property
    def stage_sizes(self) -> Tuple[int, ...]:
        return _SPECS[self.model_type][1]

    @property
    def out_channels(self) -> int:
        return 512 if self.block == "basic" else 2048


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Backbone returning layer4 patch tokens (B, H/32*W/32, C)."""

    config: ResNetConfig = ResNetConfig()

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        """images: (B, 3, H, W) in [0, 1] -> (B, P, C) tokens."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD, jnp.float32).reshape(1, 3, 1, 1)
        x = (images.astype(jnp.float32) - mean) / std
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)

        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        Block = BasicBlock if cfg.block == "basic" else BottleneckBlock
        for stage, n_blocks in enumerate(cfg.stage_sizes):
            filters = 64 * (2**stage)
            for b in range(n_blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = Block(filters, strides, dtype=dtype,
                          name=f"layer{stage + 1}_{b}")(x, train=train)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


def convert_torchvision_resnet(
    state: Dict[str, np.ndarray], cfg: ResNetConfig
) -> Dict[str, Any]:
    """torchvision resnet state dict -> flax params/batch_stats trees."""

    def conv(name):
        w = state[name + ".weight"]
        return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}

    def bn(name):
        return (
            {"scale": state[name + ".weight"], "bias": state[name + ".bias"]},
            {"mean": state[name + ".running_mean"], "var": state[name + ".running_var"]},
        )

    params: Dict[str, Any] = {"conv1": conv("conv1")}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    n_convs = 2 if cfg.block == "basic" else 3
    for stage, n_blocks in enumerate(cfg.stage_sizes):
        for b in range(n_blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            blk_p, blk_s = {}, {}
            for ci in range(1, n_convs + 1):
                blk_p[f"conv{ci}"] = conv(f"{t}.conv{ci}")
                blk_p[f"bn{ci}"], blk_s[f"bn{ci}"] = bn(f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in state:
                blk_p["downsample_conv"] = conv(f"{t}.downsample.0")
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(
                    f"{t}.downsample.1"
                )
            params[f] = blk_p
            stats[f] = blk_s
    return {"params": params, "batch_stats": stats}

"""DINOv2 ViT encoder in Flax (TPU-native re-implementation).

Functional equivalent of the reference's frozen hub DINOv2 ViT-B/14-reg
wrapper (src/models/modules/encoder/dinov2.py:6-61) and its vendored source
(src/models/sources/DINOv2/vision_transformer.py:44-267). Differences by
design: NHWC conv patch embedding (TPU layout), Pallas attention, bf16
compute with f32 params, and positional embeddings stored at the working
grid size (the weight converter interpolates the 37x37 checkpoint grid to
16x16 once at load time, so runtime shapes are static).

Token layout matches the reference: [cls, register_0..3, patch_0..255]; the
encoder output is the final-LayerNorm'ed patch tokens ("x_norm_patchtokens").
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxdreamer_tpu.models.layers import TransformerBlock

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DinoViTConfig:
    """ViT-B/14 with registers (dinov2_vitb14_reg) by default."""

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    layerscale_init: float = 1.0
    ln_eps: float = 1e-6
    dtype: str = "bfloat16"
    # 'int8': opt-in quantized serving path for the 4 per-block matmuls
    # (see models/layers.py TransformerBlock.quantize / ops/quant.py).
    quantize: str | None = None

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**2


class DinoViT(nn.Module):
    """DINOv2 vision transformer returning normalized patch tokens."""

    config: DinoViTConfig = DinoViTConfig()

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """Args:
            images: (B, 3, H, W) RGB in [0, 1] (the wrapper contract of the
                reference dinov2.py:40-47; ImageNet normalization happens
                here).

        Returns:
            (B, num_patches, embed_dim) patch tokens after the final norm.
        """
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B = images.shape[0]

        mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32).reshape(1, 3, 1, 1)
        x = (images.astype(jnp.float32) - mean) / std

        # Patch embedding as NHWC conv (TPU-friendly layout).
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dtype)  # (B, H, W, 3)
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=dtype,
            name="patch_embed",
        )(x)
        x = x.reshape(B, cfg.num_patches, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, cfg.embed_dim), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.num_patches + 1, cfg.embed_dim),
            jnp.float32,
        )
        reg_tokens = self.param(
            "register_tokens",
            nn.initializers.normal(1e-6),
            (1, cfg.num_register_tokens, cfg.embed_dim),
            jnp.float32,
        )

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(dtype), (B, 1, cfg.embed_dim)), x],
            axis=1,
        )
        x = x + pos_embed.astype(dtype)
        x = jnp.concatenate(
            [
                x[:, :1],
                jnp.broadcast_to(
                    reg_tokens.astype(dtype), (B, cfg.num_register_tokens, cfg.embed_dim)
                ),
                x[:, 1:],
            ],
            axis=1,
        )

        for i in range(cfg.depth):
            x = TransformerBlock(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qk_norm=False,
                qkv_bias=True,
                ln_eps=cfg.ln_eps,
                layerscale_init=cfg.layerscale_init,
                dtype=dtype,
                quantize=cfg.quantize,
                name=f"block_{i}",
            )(x)

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=dtype, name="norm")(x)
        return x[:, 1 + cfg.num_register_tokens :]

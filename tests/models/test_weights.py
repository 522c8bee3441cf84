"""Weight-converter parity tests: torch reference numerics vs converted Flax.

Mini torch models reproduce the reference's exact layer semantics (BETR
SelfAttentionBlock: pre-LN eps 1e-5, qkv bias, per-head RMSNorm on q/k,
SDPA, GELU MLP — blocks.py:808-886; DINOv2 block with LayerScale, eps 1e-6)
so a converted state dict must produce matching outputs in Flax.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from boxdreamer_tpu.models import BETR, BETRConfig, DinoViT, DinoViTConfig
from boxdreamer_tpu.models import weights as W
from boxdreamer_tpu.models.layers import TransformerBlock


class TorchRMSNorm(nn.Module):
    def __init__(self, d, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight


class TorchAttention(nn.Module):
    def __init__(self, dim, heads, qk_norm=True):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.q_norm = TorchRMSNorm(self.head_dim) if qk_norm else nn.Identity()
        self.k_norm = TorchRMSNorm(self.head_dim) if qk_norm else nn.Identity()

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).view(B, N, 3, self.heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, k = self.q_norm(q), self.k_norm(k)
        out = F.scaled_dot_product_attention(q, k, v, scale=self.head_dim**-0.5)
        out = out.transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, qk_norm=True, ln_eps=1e-5, layerscale=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=ln_eps)
        self.attn = TorchAttention(dim, heads, qk_norm)
        self.norm2 = nn.LayerNorm(dim, eps=ln_eps)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.ls = layerscale
        if layerscale is not None:
            self.ls1 = nn.Parameter(torch.full((dim,), layerscale))
            self.ls2 = nn.Parameter(torch.full((dim,), layerscale))

    def forward(self, x):
        h = self.attn(self.norm1(x))
        if self.ls is not None:
            h = h * self.ls1
        x = x + h
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        if self.ls is not None:
            h = h * self.ls2
        return x + h


def state_to_numpy(module, rename=None):
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    if rename:
        sd = {rename(k): v for k, v in sd.items()}
    return sd


def test_block_parity_betr_style():
    torch.manual_seed(0)
    dim, heads, N = 64, 4, 32
    tb = TorchBlock(dim, heads, qk_norm=True).eval()
    x = torch.randn(2, N, dim)
    with torch.no_grad():
        ref = tb(x).numpy()

    sd = state_to_numpy(tb, rename=lambda k: "attn.0." + k)
    # Convert via the BETR converter machinery for a single block.
    cfg = BETRConfig(d_model=dim, nhead=heads, num_decoder_layers=1, dtype="float32")
    converted = W.convert_betr(
        {**sd,
         "bbox_learnable_query": np.zeros((1, dim), np.float32),
         "bbox_emb.weight": np.zeros((dim, 8 * 196), np.float32),
         "bbox_emb.bias": np.zeros((dim,), np.float32),
         "bbox_proj.weight": np.zeros((8 * 196, dim), np.float32),
         "bbox_proj.bias": np.zeros((8 * 196,), np.float32)},
        cfg,
    )
    block = TransformerBlock(num_heads=heads, qk_norm=True, ln_eps=1e-5)
    params = {"params": converted["block_0"]}
    out = block.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_dinov2_full_parity():
    """Mini DINOv2 (torch) vs converted DinoViT (flax): full forward."""
    torch.manual_seed(1)
    cfg = DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=4, layerscale_init=1.0, dtype="float32",
    )

    class TorchMiniDino(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Sequential()
            self.patch_embed.proj = nn.Conv2d(3, 32, 14, 14)
            self.cls_token = nn.Parameter(torch.randn(1, 1, 32) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, 5, 32) * 0.02)  # 2x2+1
            self.register_tokens = nn.Parameter(torch.randn(1, 4, 32) * 0.02)
            self.blocks = nn.ModuleList(
                [TorchBlock(32, 2, qk_norm=False, ln_eps=1e-6, layerscale=1.0)
                 for _ in range(2)]
            )
            # Give layerscale gammas non-trivial values.
            for b in self.blocks:
                nn.init.normal_(b.ls1, 1.0, 0.1)
                nn.init.normal_(b.ls2, 1.0, 0.1)
            self.norm = nn.LayerNorm(32, eps=1e-6)

        def forward(self, imgs):
            mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            x = (imgs - mean) / std
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = torch.cat([self.cls_token.expand(len(x), -1, -1), x], dim=1)
            x = x + self.pos_embed
            x = torch.cat(
                [x[:, :1], self.register_tokens.expand(len(x), -1, -1), x[:, 1:]],
                dim=1,
            )
            for b in self.blocks:
                x = b(x)
            x = self.norm(x)
            return x[:, 5:]

    tm = TorchMiniDino().eval()
    imgs = torch.rand(2, 3, 28, 28)
    with torch.no_grad():
        ref = tm(imgs).numpy()

    def rename(k):
        k = k.replace("ls1", "ls1.gamma").replace("ls2", "ls2.gamma")
        return k

    sd = state_to_numpy(tm, rename)
    converted = W.convert_dinov2(sd, cfg)

    model = DinoViT(cfg)
    out = model.apply({"params": converted}, jnp.asarray(imgs.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5)


def test_pos_embed_interpolation_matches_dinov2():
    """Interpolation from a 4x4 to 2x2 grid must use the 0.1-offset bicubic
    kludge (same result as the reference's interpolate_pos_encoding)."""
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(1, 17, 8)).astype(np.float32)
    ours = W._interpolate_pos_embed(pos, 4, 2)
    t = torch.from_numpy(pos[:, 1:]).reshape(1, 4, 4, 8).permute(0, 3, 1, 2)
    scale = (2 + 0.1) / 4
    ref = torch.nn.functional.interpolate(
        t, scale_factor=(scale, scale), mode="bicubic", antialias=False
    )
    ref = ref.permute(0, 2, 3, 1).reshape(1, 4, 8).numpy()
    np.testing.assert_allclose(ours[:, 1:], ref, atol=1e-6)
    np.testing.assert_allclose(ours[:, :1], pos[:, :1], atol=0)


def test_full_betr_checkpoint_roundtrip_shapes():
    """A synthetic reference-named BETR state dict converts into params the
    real BETR module accepts and runs."""
    cfg = BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=2, patch_size=14, img_size=28,
        dtype="float32",
    )
    p2 = 14 * 14
    rng = np.random.default_rng(0)

    def r(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.02

    sd = {
        "bbox_learnable_query": r(1, 32),
        "bbox_emb.weight": r(32, p2 * 8),
        "bbox_emb.bias": r(32),
        "bbox_proj.weight": r(p2 * 8, 32),
        "bbox_proj.bias": r(p2 * 8),
        "input_transform.fc1.weight": r(32, 32),
        "input_transform.fc1.bias": r(32),
        "input_transform.fc2.weight": r(32, 32),
        "input_transform.fc2.bias": r(32),
    }
    for i in range(2):
        b = f"attn.{i}"
        sd.update({
            f"{b}.norm1.weight": r(32), f"{b}.norm1.bias": r(32),
            f"{b}.attn.qkv.weight": r(96, 32), f"{b}.attn.qkv.bias": r(96),
            f"{b}.attn.q_norm.weight": r(16), f"{b}.attn.k_norm.weight": r(16),
            f"{b}.attn.proj.weight": r(32, 32), f"{b}.attn.proj.bias": r(32),
            f"{b}.norm2.weight": r(32), f"{b}.norm2.bias": r(32),
            f"{b}.mlp.fc1.weight": r(128, 32), f"{b}.mlp.fc1.bias": r(128),
            f"{b}.mlp.fc2.weight": r(32, 128), f"{b}.mlp.fc2.bias": r(32),
        })
    converted = W.convert_betr(sd, cfg)

    model = BETR(cfg)
    B, T = 1, 2
    pose_feat = jnp.zeros((B, T, 8, 28, 28))
    tokens = jnp.zeros((B, T, 4, 32))
    masks = jnp.zeros((B, T), dtype=bool).at[:, 1].set(True)
    init = model.init(jax.random.PRNGKey(0), pose_feat, None, masks, tokens)
    merged = W.merge_params(init["params"], converted)
    out = model.apply({"params": merged}, pose_feat, None, masks, tokens)
    assert out.shape == (B, 8, 28, 28)
    assert np.isfinite(np.asarray(out)).all()

"""Torch checkpoint / safetensors -> Flax parameter conversion.

The reference distributes weights as HF safetensors
(BoxDreamer-vitb[-reproduce].safetensor, consumed in run.py:164-183 and
demo.py:1463-1474) with PyTorch-Lightning key names
(``BoxDreamer.decoder.*`` for BETR, ``BoxDreamer.rgb_encoder.model.*`` for
the hub DINOv2; scripts/tools/model_rename.py documents historical
remappings). This module maps those onto the Flax module tree:

  * torch ``Linear.weight`` (out, in) -> flax ``kernel`` (in, out),
  * torch ``Conv2d.weight`` (out, in, kh, kw) -> flax (kh, kw, in, out),
  * DINOv2 ``pos_embed`` trained at a 37x37 grid is bicubic-interpolated to
    the working grid once at load (same kludge offset 0.1 as
    sources/DINOv2/vision_transformer.py:179-213), so runtime shapes stay
    static.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from boxdreamer_tpu.models.betr import BETRConfig
from boxdreamer_tpu.models.dinov2 import DinoViTConfig
from boxdreamer_tpu.utils.log import WARNING


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt/.pth state dict to numpy (Lightning checkpoints
    keep weights under 'state_dict')."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _linear(state, name):
    w = state[f"{name}.weight"]
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{name}.bias" in state:
        out["bias"] = state[f"{name}.bias"]
    return out


def _layernorm(state, name):
    return {"scale": state[f"{name}.weight"], "bias": state[f"{name}.bias"]}


def _interpolate_pos_embed(
    pos: np.ndarray, src_grid: int, dst_grid: int, offset: float = 0.1
) -> np.ndarray:
    """(1, 1+src^2, C) -> (1, 1+dst^2, C) via torch bicubic with the DINOv2
    interpolate_offset kludge."""
    if src_grid == dst_grid:
        return pos
    import torch
    import torch.nn.functional as F

    cls, patch = pos[:, :1], pos[:, 1:]
    C = pos.shape[-1]
    t = torch.from_numpy(patch.astype(np.float32)).reshape(1, src_grid, src_grid, C)
    t = t.permute(0, 3, 1, 2)
    scale = (dst_grid + offset) / src_grid
    t = F.interpolate(t, scale_factor=(scale, scale), mode="bicubic", antialias=False)
    assert t.shape[-1] == dst_grid, t.shape
    out = t.permute(0, 2, 3, 1).reshape(1, dst_grid * dst_grid, C).numpy()
    return np.concatenate([cls, out], axis=1)


def convert_dinov2(
    state: Dict[str, np.ndarray],
    cfg: DinoViTConfig = DinoViTConfig(),
    prefix: str = "",
) -> Dict[str, Any]:
    """Hub-format DINOv2 state dict -> DinoViT flax params."""
    s = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    grid = cfg.grid_size
    pos = s["pos_embed"]
    src_grid = int(round((pos.shape[1] - 1) ** 0.5))
    params: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                s["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
            ),
            "bias": s["patch_embed.proj.bias"],
        },
        "cls_token": s["cls_token"],
        "pos_embed": _interpolate_pos_embed(pos, src_grid, grid),
        "register_tokens": s["register_tokens"],
        "norm": _layernorm(s, "norm"),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _layernorm(s, f"{b}.norm1"),
            "attn": {
                "qkv": _linear(s, f"{b}.attn.qkv"),
                "proj": _linear(s, f"{b}.attn.proj"),
            },
            "ls1": {"gamma": s[f"{b}.ls1.gamma"]},
            "norm2": _layernorm(s, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(s, f"{b}.mlp.fc1"),
                "fc2": _linear(s, f"{b}.mlp.fc2"),
            },
            "ls2": {"gamma": s[f"{b}.ls2.gamma"]},
        }
    return params


def convert_betr(
    state: Dict[str, np.ndarray],
    cfg: BETRConfig = BETRConfig(),
    prefix: str = "",
) -> Dict[str, Any]:
    """Reference BETR state dict -> BETR flax params (key names from
    betr.py: input_transform/bbox_emb/bbox_learnable_query/attn.{i}/
    bbox_proj)."""
    s = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {
        "bbox_learnable_query": s["bbox_learnable_query"],
    }
    # Representation-dependent embeddings/heads (betr.py:131-209): bb8 uses
    # bbox_emb/bbox_proj, plucker ray_emb/camera_ray_proj; nvs_supervision
    # adds rgb_proj; from-scratch diff_emb adds the input_*_emb family.
    for name in (
        "bbox_emb",
        "bbox_proj",
        "ray_emb",
        "camera_ray_proj",
        "rgb_proj",
        "input_emb",
        "input_ref_emb",
        "input_query_rgb_emb",
        "input_query_ray_emb",
    ):
        if f"{name}.weight" in s:
            params[name] = _linear(s, name)
    # The heads the target config will read MUST be present — otherwise the
    # mismatch (e.g. a plucker checkpoint into a bb8 config, or a truncated
    # file) surfaces later as a cryptic flax missing-parameter error.
    if cfg.pose_representation == "plucker":
        # ray_emb is read unconditionally by _plucker_forward (our plucker
        # path is pretrained-tokens-only; betr.py:372).
        required = ["camera_ray_proj", "ray_emb"]
    else:
        required = ["bbox_proj"] + (["bbox_emb"] if cfg.use_pretrained else [])
    missing = [n for n in required if n not in params]
    if missing:
        raise KeyError(
            f"checkpoint lacks head(s) {missing} required by "
            f"pose_representation={cfg.pose_representation!r} "
            f"(use_pretrained={cfg.use_pretrained}); found keys: "
            f"{sorted(k for k in s if k.count('.') <= 1)[:20]}"
        )
    if "input_transform.fc1.weight" in s:
        params["input_transform"] = {
            "fc1": _linear(s, "input_transform.fc1"),
            "fc2": _linear(s, "input_transform.fc2"),
        }
    for i in range(cfg.num_decoder_layers):
        b = f"attn.{i}"
        blk = {
            "norm1": _layernorm(s, f"{b}.norm1"),
            "attn": {
                "qkv": _linear(s, f"{b}.attn.qkv"),
                "proj": _linear(s, f"{b}.attn.proj"),
            },
            "norm2": _layernorm(s, f"{b}.norm2"),
            "mlp": {
                "fc1": _linear(s, f"{b}.mlp.fc1"),
                "fc2": _linear(s, f"{b}.mlp.fc2"),
            },
        }
        if f"{b}.attn.q_norm.weight" in s:
            blk["attn"]["q_norm"] = {"weight": s[f"{b}.attn.q_norm.weight"]}
            blk["attn"]["k_norm"] = {"weight": s[f"{b}.attn.k_norm.weight"]}
        params[f"block_{i}"] = blk
    return params


def convert_boxdreamer(
    state: Dict[str, np.ndarray],
    dino_cfg: DinoViTConfig = DinoViTConfig(),
    betr_cfg: BETRConfig = BETRConfig(),
    decoder_prefix: str = "BoxDreamer.decoder.",
    encoder_prefix: str = "BoxDreamer.rgb_encoder.model.",
) -> Dict[str, Any]:
    """Full reference checkpoint -> {'params': {'encoder','decoder'}}.

    If the checkpoint lacks encoder weights (common: the hub DINOv2 is
    downloaded separately), pass the hub state dict merged in, or convert
    the encoder separately and merge.
    """
    out: Dict[str, Any] = {}
    if any(k.startswith(decoder_prefix) for k in state):
        out["decoder"] = convert_betr(state, betr_cfg, prefix=decoder_prefix)
    else:
        WARNING("no decoder weights found under prefix %s", decoder_prefix)
    if any(k.startswith(encoder_prefix) for k in state):
        out["encoder"] = convert_dinov2(state, dino_cfg, prefix=encoder_prefix)
    return {"params": out}


def merge_params(target: Dict, converted: Dict) -> Dict:
    """Overlay converted params onto an initialized param tree, keeping
    target leaves where the checkpoint has none and casting dtypes to the
    target's (so bf16/f32 policy is preserved)."""
    import jax

    def overlay(t, c):
        if isinstance(t, dict):
            return {
                k: overlay(t[k], c[k]) if isinstance(c, dict) and k in c else t[k]
                for k in t
            }
        arr = np.asarray(c)
        tgt = np.asarray(t)
        if arr.shape != tgt.shape:
            WARNING(f"shape mismatch {arr.shape} vs {tgt.shape}; keeping init")
            return t
        return arr.astype(tgt.dtype)

    return overlay(target, converted)

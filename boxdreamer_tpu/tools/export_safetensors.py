"""Checkpoint <-> safetensors conversion and key remapping tools.

Equivalent of the reference tooling (scripts/tools/make_safetensor.py:1-17
ckpt->safetensor export, scripts/tools/model_rename.py checkpoint key
remapping, model_clean.py key filtering): exports a Flax param tree to a
flat reference-named safetensors file (so weights round-trip with the
reference ecosystem) and back.

Usage:
    python -m boxdreamer_tpu.tools.export_safetensors \
        --checkpoint models/checkpoints/exp/last --output weights.safetensors
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}." if prefix or True else k))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def flax_to_reference_names(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flax param tree -> flat dict with the reference's torch key names
    (inverse of models/weights.py conversions; Linear kernels transposed
    back to (out, in), conv kernels to (out, in, kh, kw))."""
    flat = _flatten(params["params"] if "params" in params else params)
    out: Dict[str, np.ndarray] = {}
    for key, value in flat.items():
        name = key
        # Module-name mapping back to reference names.
        name = name.replace("decoder.", "BoxDreamer.decoder.")
        name = name.replace("encoder.", "BoxDreamer.rgb_encoder.model.")
        name = name.replace("block_", "attn.") if "decoder" in name else name.replace(
            "block_", "blocks."
        )
        # Leaf-name mapping.
        if name.endswith(".kernel"):
            name = name[: -len(".kernel")] + ".weight"
            if value.ndim == 2:
                value = np.ascontiguousarray(value.T)
            elif value.ndim == 4:  # (kh, kw, in, out) -> (out, in, kh, kw)
                value = np.ascontiguousarray(value.transpose(3, 2, 0, 1))
        elif name.endswith(".scale"):
            name = name[: -len(".scale")] + ".weight"
        name = name.replace(".patch_embed.weight", ".patch_embed.proj.weight")
        name = name.replace(".patch_embed.bias", ".patch_embed.proj.bias")
        name = name.replace(".ls1.gamma", ".ls1.gamma")
        out[name] = value
    return out


def filter_keys(
    state: Dict[str, np.ndarray], drop_prefixes=(), keep_prefixes=None
) -> Dict[str, np.ndarray]:
    """Checkpoint surgery: drop/keep keys by prefix (reference
    scripts/tools/model_clean.py / model_warpper.py)."""
    out = {}
    for k, v in state.items():
        if any(k.startswith(p) for p in drop_prefixes):
            continue
        if keep_prefixes is not None and not any(
            k.startswith(p) for p in keep_prefixes
        ):
            continue
        out[k] = v
    return out


def remap_keys(
    state: Dict[str, np.ndarray], rules: Dict[str, str]
) -> Dict[str, np.ndarray]:
    """Prefix-substitution key remapping (reference model_rename.py)."""
    out = {}
    for k, v in state.items():
        nk = k
        for old, new in rules.items():
            if nk.startswith(old):
                nk = new + nk[len(old):]
                break
        out[nk] = v
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Export checkpoint to safetensors")
    parser.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    import orbax.checkpoint as ocp
    from safetensors.numpy import save_file

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(args.checkpoint)
    params = state.get("params", state) if isinstance(state, dict) else state.params
    flat = flax_to_reference_names(params)
    save_file({k: np.asarray(v) for k, v in flat.items()}, args.output)
    print(f"wrote {len(flat)} tensors to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

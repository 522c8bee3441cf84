"""Minimal Hydra-style config system on plain PyYAML.

The reference uses Hydra 1.3 + OmegaConf (configs/train.yaml with a defaults
list, ``${}`` interpolation, CLI dotted overrides — run.py:208). Neither is
available in this image, so this module implements the subset the config
tree needs:

  * ``defaults:`` list composition (``- group: name`` loads
    ``<config_dir>/<group>/<name>.yaml`` into key ``group``),
  * ``${a.b.c}`` interpolation against the merged root (with literal
    passthrough for unresolvable references),
  * dotted CLI overrides ``a.b.c=value`` (YAML-parsed values),
  * attribute-style access via :class:`ConfigNode`.

The key names and tree layout in configs/ mirror the reference's so users
can carry their override muscle memory across.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class ConfigNode(dict):
    """dict with attribute access and recursive wrapping."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                return default
        return node


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigNode({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


def _merge(base: Dict, extra: Dict) -> Dict:
    """Recursive dict merge; `extra` wins."""
    out = dict(base)
    for k, v in extra.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _resolve_defaults(config_dir: str, cfg: Dict) -> Dict:
    """Expand the defaults list into group keys, then overlay the file's own
    content (file content wins, like Hydra's `_self_` last)."""
    defaults = cfg.pop("defaults", [])
    merged: Dict = {}
    for entry in defaults:
        if isinstance(entry, str):
            if entry == "_self_":
                continue
            sub = _resolve_defaults(
                config_dir, _load_yaml(os.path.join(config_dir, entry + ".yaml"))
            )
            merged = _merge(merged, sub)
            continue
        (group, name), = entry.items()
        if name is None:
            continue
        sub_path = os.path.join(config_dir, group, f"{name}.yaml")
        sub = _resolve_defaults(os.path.dirname(sub_path), _load_yaml(sub_path))
        merged = _merge(merged, {group.split("/")[-1]: sub})
    return _merge(merged, cfg)


def _interpolate(obj: Any, root: Dict) -> Any:
    if isinstance(obj, dict):
        return {k: _interpolate(v, root) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_interpolate(v, root) for v in obj]
    if isinstance(obj, str):
        full = _INTERP.fullmatch(obj.strip())
        if full:
            val = _lookup(root, full.group(1))
            if val is not None:
                return _interpolate(val, root)
            return obj
        return _INTERP.sub(
            lambda m: str(_lookup(root, m.group(1), m.group(0))), obj
        )
    return obj


def _lookup(root: Dict, dotted: str, default=None):
    node: Any = root
    for part in dotted.split("."):
        if isinstance(node, dict) and part in node:
            node = node[part]
        else:
            return default
    return node


def apply_overrides(cfg: Dict, overrides: Sequence[str]) -> Dict:
    """Apply `a.b.c=value` overrides (values YAML-parsed)."""
    cfg = copy.deepcopy(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, raw = ov.split("=", 1)
        value = yaml.safe_load(raw)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return cfg


def load_config(
    config_dir: str,
    config_name: str = "test.yaml",
    overrides: Sequence[str] = (),
) -> ConfigNode:
    """Compose a config like `python run.py --config-name=<name> k=v ...`."""
    if not config_name.endswith(".yaml"):
        config_name += ".yaml"
    cfg = _resolve_defaults(config_dir, _load_yaml(os.path.join(config_dir, config_name)))
    cfg = apply_overrides(cfg, overrides)
    # Interpolate repeatedly until fixpoint (nested references).
    for _ in range(4):
        new = _interpolate(cfg, cfg)
        if new == cfg:
            break
        cfg = new
    return _wrap(cfg)


def print_key_configs(cfg, file=None):
    """Print the most important config values as a small tree — the
    reference's rich-tree print_key_configs
    (src/utils/customize/template_utils.py:27-47); rich is absent from this
    image, so plain box-drawing output (same keys, same order)."""
    import sys

    file = file or sys.stdout
    rows = [
        ("Exp name", cfg.get("exp_name", "None")),
        ("Mode", cfg.get("mode", "None")),
        ("Resume", cfg.get("resume", "None")),
        ("Use pretrain", cfg.get("use_pretrained", "None")),
        ("Precision", cfg.get("precision", "None")),
        ("Batch size", _lookup(cfg, "datamodule.batch_size", "None")),
    ]
    print("⚙ KEY CONFIG", file=file)
    for i, (k, v) in enumerate(rows):
        branch = "└──" if i == len(rows) - 1 else "├──"
        print(f"{branch} {k}: {v}", file=file)

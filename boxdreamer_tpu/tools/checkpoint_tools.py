"""Checkpoint surgery CLI: clean / rename / split / inspect.

TPU-native equivalents of the reference's checkpoint scripts:

  * ``clean``   — strip everything except the parameters from a training
    checkpoint (reference scripts/tools/model_clean.py:1-33, which keeps only
    ``state_dict`` from a Lightning ckpt). Here: orbax train-state dir or
    safetensors in, safetensors out.
  * ``rename``  — key remapping with prefix analysis and regex rules
    (reference scripts/tools/model_rename.py:1-511; its interactive
    navigate-and-rename flow is distilled to ``--strip-prefix/--add-prefix/
    --sub PATTERN REPL`` flags plus ``--dry-run`` preview).
  * ``split``   — dump each top-level part of a checkpoint to its own file
    (reference scripts/tools/model_warpper.py:1-69).
  * ``inspect`` — display the key structure with shapes/dtypes, grouped by
    prefix (reference model_rename.py display_dict_structure /
    analyze_key_structure).

All subcommands speak flat ``name -> ndarray`` dicts (safetensors layout);
orbax checkpoint directories are flattened with '.'-joined paths first.
"""

from __future__ import annotations

import argparse
import os
import re
from collections import OrderedDict
from typing import Any, Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# loading / saving
# ---------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def load_flat(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint as a flat name->array dict.

    Accepts a safetensors file or an orbax checkpoint directory (a full
    train state or a bare params tree).
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        state = ocp.StandardCheckpointer().restore(path)
        return _flatten(state)
    from safetensors.numpy import load_file

    return dict(load_file(path))


def save_flat(flat: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


# ---------------------------------------------------------------------------
# operations
# ---------------------------------------------------------------------------

# Train-state keys that are NOT model parameters (optimizer moments, step
# counters, EMA copies) — the 'clean' op drops these, mirroring the
# reference's keep-state_dict-only behavior.
_NON_PARAM_PREFIXES = ("opt_state", "optimizer", "step", "ema", "rng")


def clean_params(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Keep model parameters only; strip the 'params.' prefix if every
    surviving key carries it (so the output matches bare-params exports)."""
    kept = OrderedDict(
        (k, v)
        for k, v in flat.items()
        if not k.split(".", 1)[0].startswith(_NON_PARAM_PREFIXES)
    )
    if kept and all(k.startswith("params.") for k in kept):
        kept = OrderedDict((k[len("params."):], v) for k, v in kept.items())
    return kept


def analyze_key_structure(keys: List[str]) -> Dict[str, int]:
    """Histogram of first-level prefixes (reference
    model_rename.py:86-134 'analyze_key_structure')."""
    counts: Dict[str, int] = OrderedDict()
    for k in keys:
        head = k.split(".", 1)[0]
        counts[head] = counts.get(head, 0) + 1
    return counts


def rename_keys(
    flat: Dict[str, np.ndarray],
    strip_prefix: str = "",
    add_prefix: str = "",
    subs: List[Tuple[str, str]] = (),
) -> Dict[str, np.ndarray]:
    """Apply prefix strip/add and regex substitutions, preserving order.

    Raises on collisions (two keys renamed to the same name) — silent
    overwrites are how checkpoints get corrupted.
    """
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for k, v in flat.items():
        nk = k
        if strip_prefix and nk.startswith(strip_prefix):
            nk = nk[len(strip_prefix):]
        for pat, repl in subs:
            nk = re.sub(pat, repl, nk)
        nk = add_prefix + nk
        if nk in out:
            raise ValueError(f"rename collision: {k!r} -> {nk!r} already exists")
        out[nk] = v
    return out


def split_parts(flat: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Group keys by their first-level prefix (reference model_warpper.py
    get_model_parts/dump_model_parts)."""
    parts: Dict[str, Dict[str, np.ndarray]] = OrderedDict()
    for k, v in flat.items():
        head, _, rest = k.partition(".")
        parts.setdefault(head, OrderedDict())[rest or head] = v
    return parts


def format_structure(flat: Dict[str, np.ndarray], max_items: int = 10) -> str:
    """Human-readable structure dump (reference display_dict_structure)."""
    lines = []
    counts = analyze_key_structure(list(flat.keys()))
    total_bytes = sum(v.nbytes for v in flat.values())
    lines.append(
        f"{len(flat)} tensors, {total_bytes / 1e6:.1f} MB, "
        f"{len(counts)} top-level groups"
    )
    for head, n in counts.items():
        lines.append(f"  {head}: {n} tensors")
        shown = 0
        for k, v in flat.items():
            if k.split(".", 1)[0] != head:
                continue
            lines.append(f"    {k}: {tuple(v.shape)} {v.dtype}")
            shown += 1
            if shown >= max_items:
                remaining = n - shown
                if remaining > 0:
                    lines.append(f"    ... {remaining} more")
                break
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("clean", help="strip optimizer state, keep params")
    c.add_argument("checkpoint")
    c.add_argument("--output", default=None,
                   help="default: <name>_clean.safetensors next to the input")

    r = sub.add_parser("rename", help="remap keys")
    r.add_argument("checkpoint")
    r.add_argument("--output", required=False, default=None)
    r.add_argument("--strip-prefix", default="")
    r.add_argument("--add-prefix", default="")
    r.add_argument("--sub", nargs=2, action="append", default=[],
                   metavar=("PATTERN", "REPL"), help="regex substitution")
    r.add_argument("--dry-run", action="store_true",
                   help="print the rename map without writing")

    s = sub.add_parser("split", help="one file per top-level part")
    s.add_argument("checkpoint")
    s.add_argument("--out-dir", default=None)

    i = sub.add_parser("inspect", help="print key structure")
    i.add_argument("checkpoint")
    i.add_argument("--max-items", type=int, default=10)

    a = p.parse_args(argv)
    flat = load_flat(a.checkpoint)

    if a.cmd == "clean":
        out = a.output or _default_out(a.checkpoint, "_clean")
        cleaned = clean_params(flat)
        save_flat(cleaned, out)
        print(f"kept {len(cleaned)}/{len(flat)} tensors -> {out}")
    elif a.cmd == "rename":
        renamed = rename_keys(
            flat, a.strip_prefix, a.add_prefix, [tuple(x) for x in a.sub]
        )
        changes = [
            (old, new) for old, new in zip(flat.keys(), renamed.keys())
            if old != new
        ]
        for old, new in changes:
            print(f"{old} -> {new}")
        print(f"{len(changes)} keys renamed")
        if not a.dry_run:
            out = a.output or _default_out(a.checkpoint, "_renamed")
            save_flat(renamed, out)
            print(f"wrote {out}")
    elif a.cmd == "split":
        out_dir = a.out_dir or (os.path.splitext(a.checkpoint)[0] + "_parts")
        os.makedirs(out_dir, exist_ok=True)
        for name, part in split_parts(flat).items():
            path = os.path.join(out_dir, f"{name}.safetensors")
            save_flat(part, path)
            print(f"{name}: {len(part)} tensors -> {path}")
    else:
        print(format_structure(flat, a.max_items))
    return 0


def _default_out(path: str, suffix: str) -> str:
    base = path.rstrip("/")
    root, ext = os.path.splitext(base)
    return f"{root}{suffix}.safetensors"


if __name__ == "__main__":
    raise SystemExit(main())

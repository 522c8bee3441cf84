"""Pack a dataset's images into a boxpack file (offline tool).

Equivalent of the reference's LMDB dump tool
(src/datasets/utils/onepose_utils/lmdb_dump.py): walks a dataset root,
stores every image file keyed by its path relative to the root, and writes
``data.boxpack`` at the root. BaseDataset.attach_pack() then serves image
reads from the pack.

Usage:
    python -m boxdreamer_tpu.tools.pack_dataset --root data/lm
"""

from __future__ import annotations

import argparse
import os
from typing import Iterable, Tuple

from boxdreamer_tpu.data.boxpack import write_pack
from boxdreamer_tpu.utils.log import INFO

IMG_EXTS = (".png", ".jpg", ".jpeg")


def iter_images(root: str) -> Iterable[Tuple[str, bytes]]:
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.lower().endswith(IMG_EXTS):
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, root)
                with open(full, "rb") as fh:
                    yield rel, fh.read()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Pack dataset images")
    parser.add_argument("--root", required=True)
    parser.add_argument("--output", default=None, help="default <root>/data.boxpack")
    args = parser.parse_args(argv)
    out = args.output or os.path.join(args.root, "data.boxpack")
    n = write_pack(out, iter_images(args.root))
    INFO(f"packed {n} images into {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

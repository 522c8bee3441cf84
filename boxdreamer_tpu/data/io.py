"""Host-side io helpers (reference src/datasets/utils/data_io.py:1-120).

Pickle object caches, whole-file HDF5 dict load/save (with the reference's
'/'->'+' key transform — h5py treats '/' as sub-groups), aspect-preserving
resize targets, and bottom-right padding with optional validity masks.
h5py is an optional dependency: the functions raise a clear ImportError at
call time rather than at module import (the framework core never needs h5).
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def save_obj(obj, name: str) -> None:
    with open(name, "wb") as f:
        pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)


def load_obj(name: str):
    with open(name, "rb") as f:
        return pickle.load(f)


def load_h5(file_path: str, transform_slash: bool = True) -> Dict[str, np.ndarray]:
    """Load a whole h5 file into memory (reference load_h5, data_io.py:24-33;
    '+' in stored keys maps back to '/')."""
    import h5py

    with h5py.File(file_path, "r") as f:
        return {
            (k.replace("+", "/") if transform_slash else k): np.asarray(v)
            for k, v in f.items()
        }


def save_h5(dict_to_save: Dict[str, np.ndarray], filename: str,
            transform_slash: bool = True) -> None:
    """Save a flat dict to h5 (reference save_h5, data_io.py:36-47)."""
    import h5py

    with h5py.File(filename, "w") as f:
        for key, value in dict_to_save.items():
            f.create_dataset(
                key.replace("/", "+") if transform_slash else key, data=value
            )


def process_resize(w: int, h: int, resize: Optional[Sequence[int]],
                   df: Optional[int] = None) -> Tuple[int, int]:
    """Resolve a resize spec to (w_new, h_new) (reference data_io.py:50-65):
    [N] scales the larger side to N ([-1] keeps size), [W, H] is explicit;
    ``df`` floors both to a multiple (divisibility factor for patch grids).
    """
    if resize is not None:
        assert 0 < len(resize) <= 2, resize
        if len(resize) == 1 and resize[0] > -1:
            scale = resize[0] / max(h, w)
            w_new, h_new = int(round(w * scale)), int(round(h * scale))
        elif len(resize) == 1:
            w_new, h_new = w, h
        else:
            w_new, h_new = resize[0], resize[1]
    else:
        w_new, h_new = w, h
    if df is not None:
        w_new, h_new = (int(x // df * df) for x in (w_new, h_new))
    return w_new, h_new


def pad_bottom_right(inp: np.ndarray, pad_size: int, ret_mask: bool = False):
    """Zero-pad a (H, W) or (C, H, W) array to (pad_size, pad_size) at the
    bottom-right; optionally return the validity mask
    (reference data_io.py:68-95)."""
    assert isinstance(pad_size, int) and pad_size >= max(inp.shape[-2:]), (
        pad_size, inp.shape
    )
    mask = None
    if inp.ndim == 2:
        padded = np.zeros((pad_size, pad_size), dtype=inp.dtype)
        padded[: inp.shape[0], : inp.shape[1]] = inp
        if ret_mask:
            mask = np.zeros((pad_size, pad_size), dtype=bool)
            mask[: inp.shape[0], : inp.shape[1]] = True
    elif inp.ndim == 3:
        padded = np.zeros((inp.shape[0], pad_size, pad_size), dtype=inp.dtype)
        padded[:, : inp.shape[1], : inp.shape[2]] = inp
        if ret_mask:
            mask = np.zeros((inp.shape[0], pad_size, pad_size), dtype=bool)
            mask[:, : inp.shape[1], : inp.shape[2]] = True
    else:
        raise ValueError(f"expected 2D/3D array, got shape {inp.shape}")
    if ret_mask:
        return padded, mask
    return padded

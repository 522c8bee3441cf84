"""boxpack: packed-record image store (native mmap reader + python writer).

The framework's replacement for the reference's optional LMDB image database
(reference base.py:174-217 + the onepose lmdb_dump tool): instead of a C
LMDB dependency, a single-file packed format with

  * a Python writer (offline packing tool, see tools/pack_dataset.py),
  * a zero-copy C++ mmap reader (native/boxpack.cpp) bound via ctypes and
    compiled on demand with g++ (cached next to the source),
  * a pure-Python reader fallback when no compiler is available.

Datasets read encoded image bytes by original file path and decode with
PIL from memory — removing per-frame filesystem round-trips in loader
threads.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterable, List, Optional, Tuple

MAGIC = b"BOXPACK1"

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "boxpack.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libboxpack.so"))

_lib = None
_lib_tried = False


def _load_native():
    """Compile (if needed) and load the native reader; None on failure."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.bp_open.restype = ctypes.c_void_p
        lib.bp_open.argtypes = [ctypes.c_char_p]
        lib.bp_count.restype = ctypes.c_int64
        lib.bp_count.argtypes = [ctypes.c_void_p]
        lib.bp_get.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.bp_get.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.bp_key_at.restype = ctypes.c_int64
        lib.bp_key_at.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_char_p,
            ctypes.c_uint64,
        ]
        lib.bp_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:  # noqa: BLE001 — no compiler / unsupported platform
        _lib = None
    return _lib


def write_pack(path: str, records: Iterable[Tuple[str, bytes]]) -> int:
    """Write a boxpack file from (key, blob) pairs; returns record count."""
    index: List[Tuple[int, int, bytes]] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<QQ", 0, 0))  # patched later
        for key, blob in records:
            offset = f.tell()
            f.write(blob)
            index.append((offset, len(blob), key.encode()))
        index_offset = f.tell()
        for offset, size, key in index:
            f.write(struct.pack("<QQH", offset, size, len(key)))
            f.write(key)
        f.seek(8)
        f.write(struct.pack("<QQ", len(index), index_offset))
    return len(index)


class _PythonReader:
    """Fallback reader: parses the index, reads blobs with seek/read."""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        header = self._f.read(24)
        assert header[:8] == MAGIC, f"{path} is not a boxpack file"
        count, index_offset = struct.unpack("<QQ", header[8:])
        self._index: Dict[str, Tuple[int, int]] = {}
        self._f.seek(index_offset)
        for _ in range(count):
            offset, size, keylen = struct.unpack("<QQH", self._f.read(18))
            key = self._f.read(keylen).decode()
            self._index[key] = (offset, size)

    def __len__(self):
        return len(self._index)

    def keys(self):
        return sorted(self._index)

    def get(self, key: str) -> Optional[bytes]:
        entry = self._index.get(key)
        if entry is None:
            return None
        self._f.seek(entry[0])
        return self._f.read(entry[1])

    def close(self):
        self._f.close()


class _NativeReader:
    def __init__(self, path: str, lib):
        self._lib = lib
        self._handle = lib.bp_open(path.encode())
        if not self._handle:
            raise IOError(f"failed to open boxpack {path}")

    def __len__(self):
        return int(self._lib.bp_count(self._handle))

    def keys(self):
        out = []
        buf = ctypes.create_string_buffer(4096)
        for i in range(len(self)):
            n = self._lib.bp_key_at(self._handle, i, buf, 4096)
            out.append(buf.raw[:n].decode())
        return out

    def get(self, key: str) -> Optional[bytes]:
        size = ctypes.c_uint64()
        ptr = self._lib.bp_get(self._handle, key.encode(), ctypes.byref(size))
        if not ptr:
            return None
        return ctypes.string_at(ptr, size.value)

    def close(self):
        if self._handle:
            self._lib.bp_close(self._handle)
            self._handle = None


class BoxPack:
    """Reader facade: native mmap reader when available, python fallback."""

    def __init__(self, path: str, prefer_native: bool = True):
        self.path = path
        lib = _load_native() if prefer_native else None
        self._impl = _NativeReader(path, lib) if lib else _PythonReader(path)
        self.native = isinstance(self._impl, _NativeReader)

    def __len__(self):
        return len(self._impl)

    def keys(self):
        return self._impl.keys()

    def get(self, key: str) -> Optional[bytes]:
        return self._impl.get(key)

    def close(self):
        self._impl.close()

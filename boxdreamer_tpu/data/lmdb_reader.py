"""Read-only pure-Python LMDB page walker.

The reference optionally serves images/poses/intrinsics/boxes from an LMDB
database keyed by the original file path (reference src/datasets/base.py:
174-217, 243-343; databases produced by
src/datasets/utils/onepose_utils/lmdb_dump.py via ``lmdb.open(...)`` +
``txn.put(str(abs_path).encode(), blob)``). Neither the ``lmdb`` wheel nor
``liblmdb`` exists in this image, so this module walks the on-disk B+tree
format (LMDB data version 1, the format every 0.9.x release writes) directly
with ``mmap`` — no C dependency, read-only, zero-copy until a value is
sliced out.

Format summary (64-bit little-endian builds — the only kind the reference
runs on):

* The environment is a directory holding ``data.mdb`` (or a single file when
  opened with MDB_NOSUBDIR). Pages 0 and 1 are meta pages; the live one is
  the valid meta with the larger transaction id.
* Every page starts with a 16-byte header: pgno u64, pad u16, flags u16,
  then either (lower u16, upper u16) for node pages or pages u32 for
  overflow chains. ``flags``: 0x01 branch, 0x02 leaf, 0x04 overflow,
  0x08 meta, 0x20 LEAF2, 0x40 sub-page.
* Node pages hold a sorted array of u16 in-page offsets at byte 16, each
  pointing at a node: (lo u16, hi u16, flags u16, ksize u16, key bytes,
  payload). For leaves the value length is ``lo | hi<<16`` and the payload
  follows the key (unless node flag 0x01 BIGDATA: the payload is a u64 page
  number of an overflow chain, data at that page + 16). For branches the
  child page number is ``lo | hi<<16 | flags<<32`` and node 0's key is
  empty (acts as -inf).
* The meta page stores two 48-byte MDB_db records (FREE_DBI, MAIN_DBI):
  pad u32, flags u16, depth u16, branch/leaf/overflow page counts u64,
  entries u64, root u64. The page size of the whole file is the FREE_DBI
  ``pad`` field; named sub-databases are entries of MAIN whose value is
  another 48-byte MDB_db (node flag 0x02 SUBDATA).

Default key ordering is plain memcmp, which is exactly Python ``bytes``
comparison; databases using MDB_REVERSEKEY/INTEGERKEY/DUPSORT are rejected
loudly (the reference's dump tool uses none of them).

Caveat recorded for reviewers: no liblmdb exists in this image, so the
golden fixture in tests/data/test_lmdb_reader.py is produced by an
independent spec-following writer rather than the real library; the walker
follows mdb.c's structs (MDB_page/MDB_node/MDB_meta/MDB_db) as documented
above.
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Iterator, Optional, Tuple

MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1
PAGEHDRSZ = 16
P_INVALID = 0xFFFFFFFFFFFFFFFF

# page flags
P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20
P_SUBP = 0x40

# node flags
F_BIGDATA = 0x01
F_SUBDATA = 0x02
F_DUPDATA = 0x04

# db flags we refuse (they change key comparison / value layout)
MDB_REVERSEKEY = 0x02
MDB_DUPSORT = 0x04
MDB_INTEGERKEY = 0x08

_DB_STRUCT = struct.Struct("<IHHQQQQQ")  # MDB_db, 48 bytes


class _Db:
    __slots__ = ("pad", "flags", "depth", "branch_pages", "leaf_pages",
                 "overflow_pages", "entries", "root")

    def __init__(self, raw: bytes):
        (self.pad, self.flags, self.depth, self.branch_pages,
         self.leaf_pages, self.overflow_pages, self.entries,
         self.root) = _DB_STRUCT.unpack(raw)


class LMDBReader:
    """Read-only view of an LMDB environment's main (unnamed) database.

    Facade-compatible with :class:`boxdreamer_tpu.data.boxpack.BoxPack`
    (``get``/``keys``/``__len__``/``close``) so ``BaseDataset.attach_pack``
    accepts either store. ``get`` takes str or bytes keys.
    """

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self.path = path
        self._f = open(path, "rb")
        self._m = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self.psize, self._main = self._read_meta()
        if self._main.flags & (MDB_REVERSEKEY | MDB_DUPSORT | MDB_INTEGERKEY):
            raise NotImplementedError(
                f"{path}: main db uses flags 0x{self._main.flags:x} "
                "(reversekey/dupsort/integerkey) — unsupported by the "
                "pure-Python walker"
            )

    # ------------------------------------------------------------------ meta

    def _parse_meta(self, off: int, psize_hint: int) -> Optional[Tuple[int, int, _Db]]:
        """Returns (txnid, psize, main_db) for the meta at byte offset
        ``off`` or None if invalid."""
        m = self._m
        if off + PAGEHDRSZ + 128 > len(m):
            return None
        flags = struct.unpack_from("<H", m, off + 10)[0]
        if not flags & P_META:
            return None
        base = off + PAGEHDRSZ
        magic, version = struct.unpack_from("<II", m, base)
        if magic != MDB_MAGIC or version != MDB_DATA_VERSION:
            return None
        free_db = _Db(m[base + 24: base + 72])
        main_db = _Db(m[base + 72: base + 120])
        txnid = struct.unpack_from("<Q", m, base + 128)[0]
        psize = free_db.pad or psize_hint
        return txnid, psize, main_db

    def _read_meta(self) -> Tuple[int, _Db]:
        meta0 = self._parse_meta(0, 4096)
        if meta0 is None:
            raise ValueError(f"{self.path}: not an LMDB data file (bad meta 0)")
        psize = meta0[1]
        meta1 = self._parse_meta(psize, psize)
        best = meta0 if (meta1 is None or meta0[0] >= meta1[0]) else meta1
        return best[1], best[2]

    # ----------------------------------------------------------------- pages

    def _page(self, pgno: int) -> Tuple[int, int, int]:
        """(byte_offset, flags, num_nodes) of a node page."""
        off = pgno * self.psize
        flags, lower = struct.unpack_from("<HH", self._m, off + 10)
        return off, flags, (lower - PAGEHDRSZ) >> 1

    def _node(self, page_off: int, i: int) -> Tuple[bytes, int, int, int]:
        """(key, lo|hi value, node_flags, payload_offset) of node i."""
        ptr = struct.unpack_from("<H", self._m, page_off + PAGEHDRSZ + 2 * i)[0]
        noff = page_off + ptr
        lo, hi, nflags, ksize = struct.unpack_from("<HHHH", self._m, noff)
        key = bytes(self._m[noff + 8: noff + 8 + ksize])
        return key, lo | (hi << 16), nflags, noff + 8 + ksize

    def _leaf_value(self, size: int, nflags: int, payload_off: int) -> bytes:
        if nflags & F_DUPDATA:
            raise NotImplementedError("dupsort values unsupported")
        if nflags & F_BIGDATA:
            ovpgno = struct.unpack_from("<Q", self._m, payload_off)[0]
            start = ovpgno * self.psize + PAGEHDRSZ
            return bytes(self._m[start: start + size])
        return bytes(self._m[payload_off: payload_off + size])

    # ------------------------------------------------------------------- api

    def get(self, key, db: Optional[_Db] = None) -> Optional[bytes]:
        if isinstance(key, str):
            key = key.encode()
        pgno = (db or self._main).root
        if pgno == P_INVALID:
            return None
        while True:
            page_off, flags, n = self._page(pgno)
            if flags & P_BRANCH:
                # largest i with key_i <= key; node 0's key is -inf
                lo_i, hi_i, best = 1, n - 1, 0
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) >> 1
                    k, *_ = self._node(page_off, mid)
                    if k <= key:
                        best, lo_i = mid, mid + 1
                    else:
                        hi_i = mid - 1
                _, child, nflags, _ = self._node(page_off, best)
                pgno = child | (nflags << 32)
            elif flags & P_LEAF:
                if flags & P_LEAF2:
                    raise NotImplementedError("LEAF2 (fixed-size key) pages")
                lo_i, hi_i = 0, n - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) >> 1
                    k, size, nflags, poff = self._node(page_off, mid)
                    if k == key:
                        return self._leaf_value(size, nflags, poff)
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            else:
                raise ValueError(
                    f"{self.path}: page {pgno} has flags 0x{flags:x}, "
                    "expected branch/leaf"
                )

    def items(self, db: Optional[_Db] = None) -> Iterator[Tuple[bytes, bytes]]:
        """In-order (key, value) cursor walk."""
        root = (db or self._main).root
        if root == P_INVALID:
            return
        stack = [root]
        while stack:
            pgno = stack.pop()
            page_off, flags, n = self._page(pgno)
            if flags & P_BRANCH:
                children = []
                for i in range(n):
                    _, child, nflags, _ = self._node(page_off, i)
                    children.append(child | (nflags << 32))
                stack.extend(reversed(children))
            elif flags & P_LEAF:
                for i in range(n):
                    key, size, nflags, poff = self._node(page_off, i)
                    if nflags & F_SUBDATA:
                        continue  # named sub-db record, not user data
                    yield key, self._leaf_value(size, nflags, poff)
            else:
                raise ValueError(f"page {pgno}: flags 0x{flags:x} in tree walk")

    def keys(self):
        return [k.decode("utf-8", "surrogateescape") for k, _ in self.items()]

    def __len__(self):
        return int(self._main.entries)

    def open_db(self, name) -> _Db:
        """Resolve a named sub-database to its _Db record (pass to
        get/items). The reference stack only uses the unnamed main db."""
        if isinstance(name, str):
            name = name.encode()
        raw = self.get(name)
        if raw is None or len(raw) != 48:
            raise KeyError(f"no sub-database {name!r}")
        sub = _Db(raw)
        if sub.flags & (MDB_REVERSEKEY | MDB_DUPSORT | MDB_INTEGERKEY):
            raise NotImplementedError("sub-db comparator flags unsupported")
        return sub

    def close(self):
        if self._m is not None:
            self._m.close()
            self._f.close()
            self._m = None


def open_image_store(root: str):
    """Open whichever packed image store exists under ``root``: the
    framework's ``data.boxpack`` or a reference-produced ``data.lmdb``
    (reference onepose.py:217-229 auto-attach). Returns None when neither
    exists."""
    lmdb_path = os.path.join(root, "data.lmdb")
    pack_path = os.path.join(root, "data.boxpack")
    if os.path.exists(pack_path):
        from boxdreamer_tpu.data.boxpack import BoxPack

        return BoxPack(pack_path)
    if os.path.exists(lmdb_path):
        return LMDBReader(lmdb_path)
    return None

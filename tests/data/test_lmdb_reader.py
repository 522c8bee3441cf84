"""LMDBReader page-walker tests.

No liblmdb/lmdb wheel exists in this image (checked round 3: no
liblmdb*.so anywhere on the filesystem), so the fixture below is built by
an INDEPENDENT bottom-up writer that follows the mdb.c on-disk structs
(MDB_page/MDB_node/MDB_meta/MDB_db for 64-bit little-endian data version
1). It exercises multi-leaf trees with a branch level, overflow (BIGDATA)
values, stale-meta selection, and the empty database. The reader mirrors
reference src/datasets/base.py:174-217 usage: get(abs_path.encode()).
"""

import os
import struct

import numpy as np
import pytest

from boxdreamer_tpu.data.lmdb_reader import LMDBReader, open_image_store

PAGEHDRSZ = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF


def _even(n):
    return (n + 1) & ~1


class _Builder:
    """Bottom-up spec-following LMDB file builder (writer half of the
    format contract; deliberately independent of the reader's code paths)."""

    def __init__(self, psize=4096):
        self.psize = psize
        self.pages = {}  # pgno -> bytearray(psize)
        self.next_pg = 2
        self.nodemax = ((psize - PAGEHDRSZ) // 2) & ~1
        self.n_branch = self.n_leaf = self.n_overflow = 0

    def _alloc(self, n=1):
        pg = self.next_pg
        self.next_pg += n
        return pg

    def _node_page(self, pgno, flags, nodes):
        """nodes: list of (key, lo, hi, nflags, payload_bytes)."""
        page = bytearray(self.psize)
        upper = self.psize
        ptrs = []
        for key, lo, hi, nflags, payload in nodes:
            sz = _even(8 + len(key) + len(payload))
            upper -= sz
            struct.pack_into("<HHHH", page, upper, lo, hi, nflags, len(key))
            page[upper + 8: upper + 8 + len(key)] = key
            page[upper + 8 + len(key): upper + 8 + len(key) + len(payload)] = payload
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * len(nodes)
        struct.pack_into("<QHHHH", page, 0, pgno, 0, flags, lower, upper)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", page, PAGEHDRSZ + 2 * i, p)
        self.pages[pgno] = page

    def _overflow(self, data):
        npages = (PAGEHDRSZ + len(data) + self.psize - 1) // self.psize
        pg = self._alloc(npages)
        self.n_overflow += npages
        blob = bytearray(npages * self.psize)
        struct.pack_into("<QHH", blob, 0, pg, 0, P_OVERFLOW)
        struct.pack_into("<I", blob, 12, npages)
        blob[PAGEHDRSZ: PAGEHDRSZ + len(data)] = data
        for i in range(npages):
            self.pages[pg + i] = blob[i * self.psize: (i + 1) * self.psize]
        return pg

    def build_tree(self, records):
        """records: dict[bytes, bytes]; returns (root_pgno, depth)."""
        items = sorted(records.items())
        if not items:
            return P_INVALID, 0
        # leaves
        leaves = []  # (first_key, pgno)
        cur, cur_used = [], 0
        space = self.psize - PAGEHDRSZ

        def flush():
            nonlocal cur, cur_used
            if cur:
                pg = self._alloc()
                self.n_leaf += 1
                self._node_page(pg, P_LEAF, cur)
                leaves.append((cur[0][0], pg))
                cur, cur_used = [], 0

        for key, val in items:
            if 8 + len(key) + len(val) > self.nodemax:
                ovpg = self._overflow(val)
                payload = struct.pack("<Q", ovpg)
                nflags = F_BIGDATA
            else:
                payload, nflags = val, 0
            size = len(val)
            node = (key, size & 0xFFFF, (size >> 16) & 0xFFFF, nflags, payload)
            need = _even(8 + len(key) + len(payload)) + 2
            if cur_used + need > space:
                flush()
            cur.append(node)
            cur_used += need
        flush()

        # branch levels
        level, depth = leaves, 1
        while len(level) > 1:
            depth += 1
            nxt = []
            cur, cur_used, cur_first = [], 0, None

            def flushb():
                nonlocal cur, cur_used, cur_first
                if cur:
                    pg = self._alloc()
                    self.n_branch += 1
                    self._node_page(pg, P_BRANCH, cur)
                    nxt.append((cur_first, pg))
                    cur, cur_used, cur_first = [], 0, None

            for first_key, child in level:
                key = b"" if not cur else first_key
                need = _even(8 + len(key)) + 2
                if cur and cur_used + need > space:
                    flushb()
                    key, need = b"", _even(8) + 2
                if not cur:
                    cur_first = first_key
                cur.append((key, child & 0xFFFF, (child >> 16) & 0xFFFF,
                            (child >> 32) & 0xFFFF, b""))
                cur_used += need
            flushb()
            level = nxt
        return level[0][1], depth

    def _meta_page(self, pgno, txnid, root, depth, entries):
        page = bytearray(self.psize)
        struct.pack_into("<QHHHH", page, 0, pgno, 0, P_META, 0, 0)
        base = PAGEHDRSZ
        struct.pack_into("<II", page, base, 0xBEEFC0DE, 1)
        struct.pack_into("<QQ", page, base + 8, 0, self.psize * 1024)
        db = struct.Struct("<IHHQQQQQ")
        # FREE_DBI: pad holds the page size
        db.pack_into(page, base + 24, self.psize, 0, 0, 0, 0, 0, 0, P_INVALID)
        db.pack_into(page, base + 72, 0, 0, depth, self.n_branch,
                     self.n_leaf, self.n_overflow, entries, root)
        struct.pack_into("<Q", page, base + 128, txnid)
        self.pages[pgno] = page

    def write(self, path, records, stale_meta=False):
        root, depth = self.build_tree(records)
        if stale_meta:
            # meta0 is an older txn pointing at an empty tree: the reader
            # must pick meta1 (higher txnid).
            self._meta_page(0, 3, P_INVALID, 0, 0)
            self._meta_page(1, 4, root, depth, len(records))
        else:
            self._meta_page(0, 2, root, depth, len(records))
            self._meta_page(1, 1, P_INVALID, 0, 0)
        with open(path, "wb") as f:
            for pg in range(self.next_pg):
                f.write(self.pages.get(pg, bytes(self.psize)))


def _make_records(n=400, seed=0):
    rng = np.random.default_rng(seed)
    recs = {}
    for i in rng.permutation(n):
        key = f"/data/onepose/train_data/seq{i % 7}/color/{i:06d}.png".encode()
        recs[key] = bytes(rng.integers(0, 256, int(rng.integers(10, 200)),
                                       dtype=np.uint8))
    return recs


def test_multi_page_tree_lookup(tmp_path):
    recs = _make_records(400)
    db = tmp_path / "data.mdb"
    b = _Builder()
    b.write(str(db), recs)
    assert b.n_leaf > 1 and b.n_branch >= 1  # the tree actually has depth
    r = LMDBReader(str(db))
    assert len(r) == 400
    for k, v in recs.items():
        assert r.get(k) == v
    assert r.get(b"/missing/key.png") is None
    assert r.get(b"") is None
    # cursor walk: sorted order, full coverage
    walked = list(r.items())
    assert [k for k, _ in walked] == sorted(recs)
    assert dict(walked) == recs
    r.close()


def test_overflow_values(tmp_path):
    rng = np.random.default_rng(1)
    recs = {b"/big/one.png": bytes(rng.integers(0, 256, 10_000, dtype=np.uint8)),
            b"/big/two.png": bytes(rng.integers(0, 256, 5_000, dtype=np.uint8)),
            b"/small.txt": b"tiny"}
    db = tmp_path / "data.mdb"
    _Builder().write(str(db), recs)
    r = LMDBReader(str(db))
    for k, v in recs.items():
        assert r.get(k) == v
    assert dict(r.items()) == recs


def test_meta_selection_and_empty(tmp_path):
    recs = {b"/a": b"1", b"/b": b"2"}
    db = tmp_path / "data.mdb"
    _Builder().write(str(db), recs, stale_meta=True)
    r = LMDBReader(str(db))
    assert r.get(b"/a") == b"1" and len(r) == 2

    empty = tmp_path / "empty.mdb"
    _Builder().write(str(empty), {})
    r2 = LMDBReader(str(empty))
    assert len(r2) == 0 and r2.get(b"/a") is None and list(r2.items()) == []


def test_env_dir_and_str_keys(tmp_path):
    env = tmp_path / "data.lmdb"
    env.mkdir()
    _Builder().write(str(env / "data.mdb"), {b"/k.png": b"blob"})
    r = LMDBReader(str(env))  # directory form, like lmdb.open(path)
    assert r.get("/k.png") == b"blob"
    assert r.keys() == ["/k.png"]


def test_open_image_store_dispatch(tmp_path):
    assert open_image_store(str(tmp_path)) is None
    env = tmp_path / "data.lmdb"
    env.mkdir()
    _Builder().write(str(env / "data.mdb"), {b"/k": b"v"})
    store = open_image_store(str(tmp_path))
    assert isinstance(store, LMDBReader) and store.get(b"/k") == b"v"
    # boxpack takes precedence when both exist (framework-native format)
    from boxdreamer_tpu.data.boxpack import BoxPack, write_pack

    write_pack(str(tmp_path / "data.boxpack"), [("x", b"y")])
    assert isinstance(open_image_store(str(tmp_path)), BoxPack)


def test_named_sub_database(tmp_path):
    """open_db: a main-db record flagged SUBDATA whose value is a 48-byte
    MDB_db pointing at its own tree (how lmdb stores named databases)."""
    b = _Builder()
    sub_records = {b"/sub/x": b"1", b"/sub/y": b"22"}
    sub_root, sub_depth = b.build_tree(sub_records)
    sub_db = struct.pack(
        "<IHHQQQQQ", 0, 0, sub_depth, 0, 1, 0, len(sub_records), sub_root
    )
    # main db: one normal record + the sub-db record (node flag 0x02)
    main_pg = b._alloc()
    b.n_leaf += 1
    b._node_page(
        main_pg, P_LEAF,
        [
            (b"mydb", len(sub_db) & 0xFFFF, 0, 0x02, sub_db),  # F_SUBDATA
            (b"plain", 1, 0, 0, b"v"),
        ],
    )
    b._meta_page(0, 2, main_pg, 1, 2)
    b._meta_page(1, 1, P_INVALID, 0, 0)
    db_path = tmp_path / "data.mdb"
    with open(db_path, "wb") as f:
        for pg in range(b.next_pg):
            f.write(b.pages.get(pg, bytes(b.psize)))

    r = LMDBReader(str(db_path))
    assert r.get(b"plain") == b"v"
    sub = r.open_db("mydb")
    assert r.get(b"/sub/x", db=sub) == b"1"
    assert r.get(b"/sub/y", db=sub) == b"22"
    assert r.get(b"/missing", db=sub) is None
    assert dict(r.items(db=sub)) == sub_records
    # the cursor walk over MAIN skips the sub-db record (not user data)
    assert dict(r.items()) == {b"plain": b"v"}
    with pytest.raises(KeyError):
        r.open_db("nope")


def test_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.mdb"
    bad.write_bytes(b"\x00" * 8192)
    with pytest.raises(ValueError, match="not an LMDB"):
        LMDBReader(str(bad))


def test_dataset_reads_images_from_lmdb(tmp_path):
    """End-to-end: BaseDataset.attach_pack serves PNG decode from an LMDB
    keyed by absolute path, like reference base.py:209-227."""
    import io

    from PIL import Image

    from boxdreamer_tpu.data.base import BaseDataset, DatasetConfig

    img = Image.fromarray(
        np.random.default_rng(2).integers(0, 255, (32, 32, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    abs_path = str(tmp_path / "seq" / "000000.png")  # never written to disk
    env = tmp_path / "data.lmdb"
    env.mkdir()
    _Builder().write(str(env / "data.mdb"), {abs_path.encode(): buf.getvalue()})

    ds = BaseDataset(DatasetConfig(), split="test")
    ds.attach_pack(LMDBReader(str(env)), root=str(tmp_path))
    out = ds.read_image(abs_path)
    assert np.array_equal(np.asarray(out), np.asarray(img))

"""boxpack store tests: format roundtrip, native vs python reader parity,
dataset integration."""

import io
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data.boxpack import BoxPack, _load_native, write_pack


def make_pack(path, n=5):
    records = []
    for i in range(n):
        records.append((f"dir/img_{i}.bin", bytes([i]) * (10 + i)))
    write_pack(str(path), records)
    return records


def test_write_read_roundtrip_python(tmp_path):
    p = tmp_path / "test.boxpack"
    records = make_pack(p)
    pack = BoxPack(str(p), prefer_native=False)
    assert not pack.native
    assert len(pack) == 5
    for key, blob in records:
        assert pack.get(key) == blob
    assert pack.get("missing") is None
    assert pack.keys() == sorted(k for k, _ in records)
    pack.close()


def test_native_reader_parity(tmp_path):
    if _load_native() is None:
        pytest.skip("no C++ toolchain available")
    p = tmp_path / "test.boxpack"
    records = make_pack(p, n=32)
    native = BoxPack(str(p), prefer_native=True)
    assert native.native, "native reader should have compiled"
    py = BoxPack(str(p), prefer_native=False)
    assert len(native) == len(py) == 32
    assert native.keys() == py.keys()
    for key, blob in records:
        assert native.get(key) == py.get(key) == blob
    assert native.get("nope") is None
    native.close()
    py.close()


def test_image_roundtrip_through_pack(tmp_path):
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    p = tmp_path / "img.boxpack"
    write_pack(str(p), [("a.png", buf.getvalue())])
    pack = BoxPack(str(p))
    decoded = Image.open(io.BytesIO(pack.get("a.png")))
    np.testing.assert_array_equal(np.asarray(decoded), np.asarray(img))
    pack.close()


def test_dataset_reads_from_pack(tmp_path):
    from boxdreamer_tpu.data import DatasetConfig, build_dataset
    from boxdreamer_tpu.tools.pack_dataset import iter_images

    root = make_linemod_fixture(str(tmp_path / "lm"), n_train=4, n_test=2)
    pack_path = os.path.join(root, "data.boxpack")
    write_pack(pack_path, iter_images(root))

    cfg = DatasetConfig(image_size=64, length=3)
    ds = build_dataset("LINEMOD", cfg, "test", root=root)
    batch_fs = ds[0]

    ds.attach_pack(BoxPack(pack_path), root)
    batch_pack = ds[0]
    np.testing.assert_allclose(batch_fs["images"], batch_pack["images"])

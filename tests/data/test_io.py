"""io helper tests (reference src/datasets/utils/data_io.py parity)."""

import numpy as np
import pytest

from boxdreamer_tpu.data import io as dio


def test_obj_roundtrip(tmp_path):
    p = str(tmp_path / "x.pkl")
    dio.save_obj({"a": np.arange(3), "b": "s"}, p)
    out = dio.load_obj(p)
    np.testing.assert_array_equal(out["a"], [0, 1, 2])
    assert out["b"] == "s"


def test_h5_roundtrip_slash_transform(tmp_path):
    h5py = pytest.importorskip("h5py")  # noqa: F841
    p = str(tmp_path / "x.h5")
    data = {"scene/frame0": np.ones((2, 2)), "plain": np.arange(4)}
    dio.save_h5(data, p)
    out = dio.load_h5(p)
    assert set(out) == {"scene/frame0", "plain"}
    np.testing.assert_array_equal(out["scene/frame0"], np.ones((2, 2)))
    # Without the transform the stored '+' key is visible.
    raw = dio.load_h5(p, transform_slash=False)
    assert "scene+frame0" in raw


@pytest.mark.parametrize(
    "w,h,resize,df,expect",
    [
        (640, 480, [320], None, (320, 240)),
        (640, 480, [-1], None, (640, 480)),
        (640, 480, [100, 200], None, (100, 200)),
        (640, 480, None, None, (640, 480)),
        (640, 480, [300], 8, (296, 224)),  # floor to multiples of 8
    ],
)
def test_process_resize(w, h, resize, df, expect):
    assert dio.process_resize(w, h, resize, df) == expect


def test_pad_bottom_right_2d_and_3d():
    a = np.ones((2, 3))
    p, m = dio.pad_bottom_right(a, 4, ret_mask=True)
    assert p.shape == (4, 4) and p[:2, :3].all() and p[3, 3] == 0
    assert m[:2, :3].all() and not m[2:, :].any()
    b = np.ones((2, 2, 3))
    p3 = dio.pad_bottom_right(b, 5)
    assert p3.shape == (2, 5, 5)
    with pytest.raises(AssertionError):
        dio.pad_bottom_right(a, 2)
    with pytest.raises(ValueError):
        dio.pad_bottom_right(np.ones((1, 1, 1, 1)), 2)

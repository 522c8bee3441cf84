"""MJPEG-AVI round-trip tests (utils/video.py — the dependency-free
equivalent of the reference's cv2/ffmpeg video surface:
scripts/tools/video_maker.py, src/demo/preprocess_video.py)."""

import os

import numpy as np
import pytest

from boxdreamer_tpu.utils import video as V


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth blocks compress well and survive JPEG with small error.
    out = []
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = (40 * i) % 256
        f[h // 4:h // 2, w // 4:w // 2] = rng.integers(100, 200, 3, np.uint8)
        out.append(f)
    return out


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "clip.avi")
    frames = _frames()
    n = V.write_video(path, frames, fps=12.0, quality=95)
    assert n == 6

    total, fps, (w, h) = V.probe_video(path)
    assert total == 6 and w == 64 and h == 48
    assert abs(fps - 12.0) < 0.01

    decoded, fps2 = V.read_video(path)
    assert len(decoded) == 6 and abs(fps2 - 12.0) < 0.01
    for orig, dec in zip(frames, decoded):
        assert dec.shape == orig.shape
        # JPEG is lossy; block content must survive within tolerance.
        assert np.mean(np.abs(dec.astype(int) - orig.astype(int))) < 6


def test_read_max_frames(tmp_path):
    path = str(tmp_path / "clip.avi")
    V.write_video(path, _frames(8), fps=30.0)
    decoded, _ = V.read_video(path, max_frames=3)
    assert len(decoded) == 3


def test_frames_dir_roundtrip(tmp_path):
    from PIL import Image

    src = tmp_path / "frames"
    src.mkdir()
    frames = _frames(5)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(src / f"{i:04d}.png")
    avi = str(tmp_path / "out.avi")
    assert V.frames_to_video(str(src), avi, fps=10) == 5

    out = tmp_path / "back"
    assert V.video_to_frames(avi, str(out), stride=2) == 3
    assert sorted(os.listdir(out)) == ["000000.png", "000001.png", "000002.png"]


def test_load_frames_any(tmp_path):
    avi = str(tmp_path / "x.avi")
    V.write_video(avi, _frames(4))
    assert len(V.load_frames_any(avi)) == 4
    assert len(V.load_frames_any(avi, max_frames=2)) == 2
    with pytest.raises(ValueError, match="unsupported video container"):
        V.load_frames_any(str(tmp_path / "x.mp4"))


def test_mismatched_frame_size_rejected(tmp_path):
    w = V.MJPEGWriter(str(tmp_path / "y.avi"))
    w.append(np.zeros((32, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="frame size"):
        w.append(np.zeros((16, 32, 3), np.uint8))
    w.close()


def test_video_maker_cli(tmp_path, capsys):
    from PIL import Image

    from boxdreamer_tpu.tools import video_maker

    src = tmp_path / "frames"
    src.mkdir()
    for i, f in enumerate(_frames(3)):
        Image.fromarray(f).save(src / f"{i}.jpg")
    avi = str(tmp_path / "c.avi")
    assert video_maker.main(["make", str(src), avi, "--fps", "5"]) == 0
    assert video_maker.main(["probe", avi]) == 0
    out = capsys.readouterr().out
    assert "3 frames @ 5 fps" in out
    assert video_maker.main(["split", avi, str(tmp_path / "d")]) == 0
    assert len(os.listdir(tmp_path / "d")) == 3


def test_gradio_load_video_avi(tmp_path):
    """The gradio demo's load_video now decodes MJPEG-AVI natively."""
    from boxdreamer_tpu.demo import gradio_state as gs

    avi = str(tmp_path / "demo.avi")
    V.write_video(avi, _frames(4))
    state = gs.init_state()
    state = gs.load_video(avi, state)
    side = state["mode1"]
    assert len(side["frames"]) == 4
    assert "loaded 4 frames" in side["status"]

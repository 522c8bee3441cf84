"""Demo pipeline tests: segmentation backends + the full frames->poses flow
with a tiny model on the synthetic fixture."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
from fixture import K_DEFAULT, cube_vertices, look_at_pose, project  # noqa: E402

from boxdreamer_tpu.demo.pipeline import DemoConfig, DemoPipeline, default_intrinsics
from boxdreamer_tpu.demo.segmentation import ThresholdSegmenter


def test_threshold_segmenter_finds_object():
    arr = np.zeros((96, 128, 3), np.uint8)
    arr[30:60, 40:90] = [200, 150, 100]
    # A small bright speckle elsewhere — largest-component keeps the object.
    arr[5, 5] = [255, 255, 255]
    seg = ThresholdSegmenter(threshold=0.1)
    mask = seg.segment([Image.fromarray(arr)])[0]
    box = seg.mask_to_box(mask)
    np.testing.assert_allclose(box, [40, 30, 90, 60], atol=1)
    assert not mask[5, 5]


def test_default_intrinsics():
    K = default_intrinsics((640, 480))
    assert K[0, 0] == K[1, 1] == 1.2 * 640
    assert K[0, 2] == 320 and K[1, 2] == 240


def make_demo_frames(root, n=10):
    """In-the-wild-style frames with pose sidecar files (the post-DUSt3R
    layout the reference demo writes)."""
    os.makedirs(root, exist_ok=True)
    K = default_intrinsics((320, 240))
    for i in range(n):
        pose = look_at_pose(2 * np.pi * i / n)
        pts = project(K, pose, cube_vertices())
        box = [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
        img = Image.new("RGB", (320, 240), (3, 3, 5))
        from PIL import ImageDraw

        ImageDraw.Draw(img).rectangle([int(v) for v in box], fill=(190, 130, 70))
        img.save(os.path.join(root, f"{i:04d}.png"))
        np.savetxt(os.path.join(root, f"{i:04d}-pose.txt"), pose)
    return root


def test_demo_pipeline_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from boxdreamer_tpu.models import (
        BETRConfig,
        BoxDreamer,
        BoxDreamerConfig,
        DinoViTConfig,
    )

    frames = make_demo_frames(str(tmp_path / "frames"))
    model = BoxDreamer(
        BoxDreamerConfig(
            betr=BETRConfig(
                d_model=32, nhead=2, num_decoder_layers=1, patch_size=14,
                img_size=28, dtype="float32",
            ),
            dino=DinoViTConfig(
                img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
                dtype="float32",
            ),
            pnp_iters=3,
        )
    )
    T, S = 4, 28
    mask = jnp.zeros((1, T), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T, 3, S, S)),
        jnp.zeros((1, T, 8, S, S)),
        mask,
    )
    cfg = DemoConfig(
        image_size=S, num_refs=3, segmenter="threshold",
        export_video=True, video_fps=10.0,
    )
    pipeline = DemoPipeline(model, params, cfg)
    out_dir = str(tmp_path / "out")
    result = pipeline.run(frames, out_dir)
    assert len(result["poses"]) == 10
    assert result["bbox_3d"].shape == (8, 3)
    assert os.path.exists(os.path.join(out_dir, "poses.npy"))
    assert os.path.exists(os.path.join(out_dir, "overlay_0000.png"))
    assert os.path.exists(os.path.join(out_dir, "references", "0000-pose.txt"))
    for pose in result["poses"]:
        assert np.isfinite(pose).all()
    # Overlay video export (reference demo.py mp4 export -> MJPEG-AVI here).
    from boxdreamer_tpu.utils.video import probe_video

    total, fps, _ = probe_video(os.path.join(out_dir, "tracked.avi"))
    assert total == 10 and abs(fps - 10.0) < 0.01


def test_demo_load_frames_avi(tmp_path):
    """The demo consumes MJPEG-AVI input directly (no ffmpeg)."""
    from boxdreamer_tpu.demo.pipeline import load_frames
    from boxdreamer_tpu.utils.video import write_video

    avi = str(tmp_path / "in.avi")
    write_video(avi, [np.full((32, 32, 3), 60 * i, np.uint8) for i in range(5)])
    files = load_frames(avi, stride=2)
    assert len(files) == 3
    assert all(f.endswith(".png") for f in files)


def test_rerun_log_frame_under_mock():
    """demo/rerun_log.py parity with reference log_to_rerun
    (demo.py:1007-1104): entity paths, box edges, camera transform+pinhole,
    FPS fallback chain — exercised under a mocked rerun module (the SDK is
    absent from this image, exactly the gated path)."""
    import types

    from boxdreamer_tpu.demo import rerun_log

    calls = []

    class _Rec:
        def __init__(self, name):
            self.name = name

        def __call__(self, *a, **k):
            return (self.name, a, k)

    rr = types.SimpleNamespace(
        set_time_sequence=lambda *a: calls.append(("time", a)),
        log=lambda path, payload: calls.append((path, payload)),
        Image=_Rec("Image"),
        Points3D=_Rec("Points3D"),
        LineStrips3D=_Rec("LineStrips3D"),
        Transform3D=_Rec("Transform3D"),
        Pinhole=_Rec("Pinhole"),
        # No TimeSeriesScalar/Scalar attrs -> exercises the TextLog fallback.
        TextLog=_Rec("TextLog"),
    )

    frame = np.zeros((28, 28, 3), np.float32)
    pose = np.eye(4)
    K = np.array([[100.0, 0, 14], [0, 100, 14], [0, 0, 1]])
    box = np.random.default_rng(0).normal(size=(8, 3))
    rerun_log.log_frame(
        rr, 5, frame, ref_images=[frame, frame], pose=pose, intrinsics=K,
        bbox_3d=box, fps=12.0, points=np.zeros((4, 3)),
    )
    paths = [c[0] for c in calls]
    assert ("time", ("frame", 5)) in calls
    for expected in ("query/image", "references/ref_0", "references/ref_1",
                     "3d/point_cloud", "3d/bbox", "3d/camera",
                     "3d/camera/pinhole", "stats/fps_text"):
        assert expected in paths, (expected, paths)
    # Box edges: 12 strips, each a corner pair (reference demo.py:1050-1069).
    strips = dict(calls)["3d/bbox"][1][0]
    assert len(strips) == 12 and len(strips[0]) == 2
    # init_rerun gates on the missing SDK without raising.
    assert rerun_log.init_rerun() is None

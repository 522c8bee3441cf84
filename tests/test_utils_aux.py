"""Tests for aux runtime: vis, profiling, memory, logging, async queue, comm."""

import json
import os
import time

import numpy as np
from PIL import Image

from boxdreamer_tpu.parallel import comm
from boxdreamer_tpu.utils import vis
from boxdreamer_tpu.utils.async_queue import AsyncQueueManager
from boxdreamer_tpu.utils.logging_utils import (
    ExperimentLogger,
    flatten_metrics,
    safe_operation,
)
from boxdreamer_tpu.utils.memory import auto_cleanup, device_memory_stats, free_pytree
from boxdreamer_tpu.utils.profiling import FPSMeter, StepTimer


def test_draw_3d_box():
    img = np.zeros((64, 64, 3), np.uint8)
    corners = np.array(
        [[10, 10], [10, 40], [40, 40], [40, 10], [15, 15], [15, 45], [45, 45], [45, 15]],
        dtype=np.float64,
    )
    out = vis.draw_3d_box(img, corners, color=(0, 255, 0))
    arr = np.asarray(out)
    assert (arr[:, :, 1] > 0).any()


def test_reproj_and_compare_boxes():
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    pose = np.eye(4)
    pose[2, 3] = 1.0
    box = np.random.default_rng(0).uniform(-0.1, 0.1, (8, 3))
    img = np.zeros((64, 64, 3), np.uint8)
    out = vis.compare_boxes(img, K, pose, pose, box)
    assert out.size == (64, 64)


def test_heatmap_overlay():
    img = np.zeros((3, 32, 32), np.float32)
    hm = np.full((8, 32, 32), -1.0, np.float32)
    hm[0, 16, 16] = 1.0
    out = np.asarray(vis.heatmap_overlay(img, hm))
    assert out[16, 16, 0] > 100  # red hot spot
    assert out[0, 0, 0] < 20


def test_vis_utils_panel():
    v = vis.VisUtils(max_samples=2)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    pose = np.eye(4)
    pose[2, 3] = 1.0
    box = np.random.default_rng(1).uniform(-0.1, 0.1, (8, 3))
    for _ in range(3):
        v.add_data(np.zeros((3, 32, 32), np.float32), K, pose, pose, box)
    assert len(v.samples) == 2
    panel = v.render()
    assert panel is not None


def test_plot_cameras(tmp_path):
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, 2, 3] = [1, 1.2, 1.4]
    path = str(tmp_path / "cams.png")
    vis.plot_cameras(poses, poses, path=path)
    assert os.path.exists(path)


def test_step_timer_and_fps():
    t = StepTimer()
    with t.phase("work"):
        time.sleep(0.01)
    s = t.summary()
    assert s["work"]["count"] == 1 and s["work"]["mean_ms"] >= 10
    assert "work" in t.report()

    f = FPSMeter(window=3)
    assert f.tick() is None
    for _ in range(4):
        fps = f.tick()
    assert fps is not None and fps > 0


def test_memory_utils():
    import jax.numpy as jnp

    x = jnp.ones((16, 16))
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    with auto_cleanup({"x": x}):
        pass
    free_pytree({"x": x})  # double free tolerated


def test_flatten_metrics():
    flat = flatten_metrics({"a": {"b": 1.0, "c": {"d": 2}}, "e": 3})
    assert flat == {"a/b": 1.0, "a/c/d": 2.0, "e": 3.0}


def test_experiment_logger(tmp_path):
    lg = ExperimentLogger(str(tmp_path))
    lg.log_metrics({"loss": 0.5, "nested": {"x": 1}}, step=1)
    lg.log_image("panel", np.zeros((8, 8, 3), np.uint8), step=1)
    lg.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["loss"] == 0.5 and rec["nested/x"] == 1.0
    assert any(f.endswith("_1.png") for f in os.listdir(tmp_path))


def test_experiment_logger_csv(tmp_path):
    lg = ExperimentLogger(str(tmp_path), use_csv=True)
    lg.log_metrics({"loss": 0.5}, step=1)
    lg.log_metrics({"loss": 0.25, "acc": 0.9}, step=2)  # header grows
    lg.close()
    import csv

    rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
    assert len(rows) == 2
    assert rows[0]["loss"] == "0.5" and rows[0]["acc"] == ""
    assert rows[1]["acc"] == "0.9" and rows[1]["step"] == "2"


def test_csv_writer_appends_without_rewrite(tmp_path):
    """Stable-header rows APPEND (no O(n^2) rewrite, no truncate window):
    after the header settles, external appends to the file survive further
    log calls — they would be wiped by a whole-file rewrite."""
    from boxdreamer_tpu.utils.logging_utils import CSVWriter

    w = CSVWriter(str(tmp_path / "m.csv"))
    w.append({"step": 1, "time": 0.0, "loss": 1.0})
    # sentinel line appended out-of-band: a rewrite would destroy it
    with open(tmp_path / "m.csv", "a") as f:
        f.write("#sentinel\n")
    w.append({"step": 2, "time": 0.0, "loss": 0.5})  # same header -> append
    w.append({"step": 3, "time": 0.0, "loss": 0.25})
    text = open(tmp_path / "m.csv").read()
    assert "#sentinel" in text and text.count("\n") == 5
    # header growth rewrites (atomically) and drops the sentinel
    w.append({"step": 4, "time": 0.0, "loss": 0.1, "acc": 0.9})
    import csv

    rows = list(csv.DictReader(open(tmp_path / "m.csv")))
    assert [r["step"] for r in rows] == ["1", "2", "3", "4"]
    assert rows[3]["acc"] == "0.9" and rows[0]["acc"] == ""
    assert not (tmp_path / "m.csv.tmp").exists()


def test_temp_frames_dirs_cleanup(tmp_path):
    from boxdreamer_tpu.utils import video as v

    d1 = v.make_temp_frames_dir(prefix="t_")
    d2 = v.make_temp_frames_dir(prefix="t_")
    assert os.path.isdir(d1) and os.path.isdir(d2)
    v.cleanup_temp_frame_dirs()
    assert not os.path.exists(d1) and not os.path.exists(d2)
    v.cleanup_temp_frame_dirs()  # idempotent


def test_convert_to_mp4_gated(tmp_path):
    from boxdreamer_tpu.utils.video import (convert_to_mp4, ffmpeg_available,
                                            write_video)

    avi = str(tmp_path / "x.avi")
    write_video(avi, [np.zeros((16, 16, 3), np.uint8)] * 3, fps=5)
    if ffmpeg_available():
        out = convert_to_mp4(avi)
        assert os.path.getsize(out) > 0
    else:
        import pytest

        with pytest.raises(RuntimeError, match="ffmpeg"):
            convert_to_mp4(avi)


def test_safe_operation_catches():
    calls = []

    @safe_operation(barrier=False)
    def boom():
        calls.append(1)
        raise RuntimeError("x")

    assert boom() is None
    assert calls == [1]


def test_async_queue():
    done = []
    q = AsyncQueueManager(threshold=2)
    q.submit(lambda: done.append(1))
    assert done == []  # below threshold, not flushed yet
    q.submit(lambda: done.append(2))
    q.join()
    assert sorted(done) == [1, 2]
    q.shutdown()


def test_comm_single_process():
    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    comm.synchronize()
    out = comm.all_gather_array(np.arange(3))
    assert out.shape == (1, 3)
    vals = comm.all_gather_metric_lists({"a": [1.0, 2.0]})
    assert vals["a"] == [1.0, 2.0]

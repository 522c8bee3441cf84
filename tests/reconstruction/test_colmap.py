"""COLMAP backend control-flow tests with a faked pycolmap module and a fake
COLMAP CLI runner — verifies the full orchestration (workspace, image dump,
project txt files with fixed GT poses, database registration, the four CLI
steps in order, PLY import, pruning + export) without COLMAP installed.
"""

import os
import types

import numpy as np
import pytest

from boxdreamer_tpu.data.ply import read_ply_points, write_ply
from boxdreamer_tpu.reconstruction.colmap import (
    COLMAPReconstructor,
    rotation_to_qvec,
)


class FakeDatabase:
    instances = []

    def __init__(self, path):
        self.path = path
        self.cameras = []
        self.images = []
        self.committed = False
        self.closed = False
        FakeDatabase.instances.append(self)

    def add_camera(self, cam):
        self.cameras.append(cam)
        return len(self.cameras)

    def add_image(self, img):
        self.images.append(img)
        return len(self.images)

    def commit(self):
        self.committed = True

    def close(self):
        self.closed = True


def make_fake_pycolmap():
    mod = types.ModuleType("pycolmap")
    mod.Database = FakeDatabase
    mod.Camera = lambda **kw: dict(kw)
    mod.Image = lambda **kw: dict(kw)
    return mod


class FakeColmapCLI:
    """Simulates the colmap executable: records invocations; database_creator
    touches the db; model_converter writes a plausible point cloud."""

    def __init__(self, n_points=200, seed=0):
        self.calls = []
        self.n_points = n_points
        self.seed = seed

    def __call__(self, cmd):
        self.calls.append(cmd)
        sub = cmd[1]
        args = dict(zip(cmd[2::2], cmd[3::2]))
        if sub == "database_creator":
            open(args["--database_path"], "wb").close()
        elif sub == "model_converter":
            rng = np.random.default_rng(self.seed)
            pts = rng.normal(0, 0.03, (self.n_points, 3))
            pts[0] = [5.0, 5.0, 5.0]  # outlier the pruning should remove
            colors = rng.integers(0, 255, (self.n_points, 3)).astype(np.uint8)
            write_ply(args["--output_path"], pts, colors)
        return types.SimpleNamespace(returncode=0)


def _rot(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    axis /= np.linalg.norm(axis)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


@pytest.fixture
def recon(tmp_path):
    FakeDatabase.instances.clear()
    cli = FakeColmapCLI()
    r = COLMAPReconstructor(
        cache_path=str(tmp_path / "colmap_cache"),
        runner=cli,
        pycolmap_module=make_fake_pycolmap(),
    )
    rng = np.random.default_rng(1)
    T = 4
    images = rng.uniform(0, 1, (1, T, 3, 32, 32)).astype(np.float32)
    Ks = np.tile(np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]]), (1, T, 1, 1))
    poses = np.tile(np.eye(4), (1, T, 1, 1))
    for i in range(T):
        poses[0, i, :3, :3] = _rot(rng.normal(size=3), rng.uniform(0.1, 1.0))
        poses[0, i, :3, 3] = [0.01 * i, -0.01 * i, 0.5]
    r.set_processed_data(
        {"images": images, "non_ndc_intrinsics": Ks, "poses": poses}
    )
    return r, cli, poses[0]


def test_rotation_to_qvec_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        R = _rot(rng.normal(size=3), rng.uniform(0, 3))
        qw, qx, qy, qz = rotation_to_qvec(R)
        # rebuild rotation from quaternion
        q = np.array([qw, qx, qy, qz])
        w, x, y, z = q
        R2 = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(R2, R, atol=1e-10)


def test_full_pipeline_to_ply(recon, tmp_path):
    r, cli, poses = recon
    out_ply = str(tmp_path / "out" / "model.ply")
    result = r.run(output_ply=out_ply)

    # CLI steps in the reference's order (colmap.py:177-225)
    subs = [c[1] for c in cli.calls]
    assert subs == [
        "database_creator",
        "feature_extractor",
        "exhaustive_matcher",
        "point_triangulator",
        "model_converter",
    ]
    # images dumped
    assert len(os.listdir(r.image_dir)) == 4
    # project files written with fixed poses
    sparse0 = os.path.join(r.sparse_path, "0")
    assert os.path.exists(os.path.join(sparse0, "cameras.txt"))
    lines = [
        l
        for l in open(os.path.join(sparse0, "images.txt"))
        if l.strip() and not l.startswith("#")
    ]
    assert len(lines) == 4
    first = lines[0].split()
    np.testing.assert_allclose(
        [float(v) for v in first[1:5]], rotation_to_qvec(poses[0][:3, :3]), atol=1e-9
    )
    np.testing.assert_allclose(
        [float(v) for v in first[5:8]], poses[0][:3, 3], atol=1e-9
    )
    # identical intrinsics -> ONE camera id used by all images
    assert {l.split()[8] for l in lines} == {"1"}
    assert open(os.path.join(sparse0, "points3D.txt")).read() == ""

    # database registration through the faked pycolmap
    db = FakeDatabase.instances[-1]
    assert len(db.cameras) == 1 and len(db.images) == 4
    assert db.committed and db.closed

    # points imported, outlier pruned, PLY + box written
    assert len(result["points"]) < 200  # the [5,5,5] outlier got pruned
    assert result["bbox_3d"].shape == (8, 3)
    pts, colors = read_ply_points(out_ply)
    assert len(pts) == len(result["points"]) and colors is not None
    assert os.path.exists(os.path.join(tmp_path, "out", "box3d_corners.txt"))


def test_distinct_intrinsics_get_distinct_camera_ids(tmp_path):
    FakeDatabase.instances.clear()
    cli = FakeColmapCLI()
    r = COLMAPReconstructor(
        cache_path=str(tmp_path / "cc"),
        runner=cli,
        pycolmap_module=make_fake_pycolmap(),
    )
    images = np.random.default_rng(0).uniform(0, 1, (1, 2, 3, 16, 16)).astype(
        np.float32
    )
    Ks = np.stack(
        [
            np.array([[30.0, 0, 8], [0, 30.0, 8], [0, 0, 1]]),
            np.array([[40.0, 0, 8], [0, 40.0, 8], [0, 0, 1]]),
        ]
    )[None]
    poses = np.tile(np.eye(4), (1, 2, 1, 1))
    poses[0, :, 2, 3] = 0.5
    r.set_processed_data({"images": images, "non_ndc_intrinsics": Ks, "poses": poses})
    r.run(output_ply=str(tmp_path / "m.ply"))
    assert len(FakeDatabase.instances[-1].cameras) == 2


def test_masked_image_prep(tmp_path):
    """Masks black out the background and crop to the padded square bbox
    (reference colmap.py:133-147)."""
    FakeDatabase.instances.clear()
    r = COLMAPReconstructor(
        cache_path=str(tmp_path / "cc"),
        runner=FakeColmapCLI(),
        pycolmap_module=make_fake_pycolmap(),
    )
    images = np.ones((1, 1, 3, 40, 40), dtype=np.float32)
    masks = np.zeros((1, 1, 1, 40, 40), dtype=np.float32)
    masks[..., 10:30, 10:30] = 1.0
    Ks = np.tile(np.array([[30.0, 0, 20], [0, 30.0, 20], [0, 0, 1]]), (1, 1, 1, 1))
    poses = np.tile(np.eye(4), (1, 1, 1, 1))
    poses[0, 0, 2, 3] = 0.5
    r.set_processed_data(
        {
            "images": images,
            "image_masks": masks,
            "non_ndc_intrinsics": Ks,
            "poses": poses,
        }
    )
    r._reinit_workspace()
    paths = r._dump_images()
    from PIL import Image

    im = np.asarray(Image.open(paths[0]))
    # cropped to ~22x22 (20px bbox + 10% padding)
    assert im.shape[0] < 40 and im.shape[1] < 40
    assert im.mean() > 100  # foreground survives (white-ish)

"""Mesh-surface CAD sampling tests (reference sample_points_on_cad.py
semantics: area-weighted uniform surface sampling + corner/diameter helpers).
"""

import numpy as np
import pytest

from boxdreamer_tpu.data import ply as plymod
from boxdreamer_tpu.training.metrics import add_metrics


def _cuboid(w=2.0, h=1.0, d=1.0):
    """Axis-aligned cuboid mesh centered at origin, 12 triangles."""
    x, y, z = w / 2, h / 2, d / 2
    v = np.array(
        [
            [-x, -y, -z],
            [x, -y, -z],
            [x, y, -z],
            [-x, y, -z],
            [-x, -y, z],
            [x, -y, z],
            [x, y, z],
            [-x, y, z],
        ]
    )
    quads = [
        [0, 1, 2, 3],
        [4, 5, 6, 7],
        [0, 1, 5, 4],
        [2, 3, 7, 6],
        [1, 2, 6, 5],
        [0, 3, 7, 4],
    ]
    f = []
    for q in quads:
        f.append([q[0], q[1], q[2]])
        f.append([q[0], q[2], q[3]])
    return v, np.asarray(f, dtype=np.int64)


def _write_ascii_ply_mesh(path, v, f):
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(v)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n")
        fh.write("property list uchar int vertex_indices\n")
        fh.write("end_header\n")
        for p in v:
            fh.write(f"{p[0]} {p[1]} {p[2]}\n")
        for tri in f:
            fh.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def _write_binary_ply_mesh(path, v, f):
    import struct

    with open(path, "wb") as fh:
        fh.write(b"ply\nformat binary_little_endian 1.0\n")
        fh.write(f"element vertex {len(v)}\n".encode())
        fh.write(b"property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n".encode())
        fh.write(b"property list uchar int vertex_indices\n")
        fh.write(b"end_header\n")
        for p in v:
            fh.write(struct.pack("<3f", *p))
        for tri in f:
            fh.write(struct.pack("<B3i", 3, *tri))


def _on_cuboid_surface(pts, w=2.0, h=1.0, d=1.0, tol=1e-9):
    half = np.array([w / 2, h / 2, d / 2])
    inside = np.all(np.abs(pts) <= half + tol, axis=1)
    on_face = np.any(np.abs(np.abs(pts) - half) <= tol, axis=1)
    return inside & on_face


@pytest.mark.parametrize("writer", [_write_ascii_ply_mesh, _write_binary_ply_mesh])
def test_read_ply_mesh_roundtrip(tmp_path, writer):
    v, f = _cuboid()
    p = tmp_path / "m.ply"
    writer(str(p), v, f)
    rv, rf = plymod.read_ply_mesh(str(p))
    np.testing.assert_allclose(rv, v, atol=1e-6)
    np.testing.assert_array_equal(rf, f)


def test_obj_mesh_roundtrip(tmp_path):
    v, f = _cuboid()
    p = tmp_path / "m.obj"
    with open(p, "w") as fh:
        for vv in v:
            fh.write(f"v {vv[0]} {vv[1]} {vv[2]}\n")
        for tri in f:
            fh.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    rv, rf = plymod.read_obj_mesh(str(p))
    np.testing.assert_allclose(rv, v)
    np.testing.assert_array_equal(rf, f)


def test_surface_sampling_area_weighted():
    v, f = _cuboid(w=4.0, h=1.0, d=1.0)  # big faces vs small faces
    pts = plymod.sample_points_on_mesh(v, f, 40000, seed=1)
    assert pts.shape == (40000, 3)
    assert _on_cuboid_surface(pts, 4.0, 1.0, 1.0, tol=1e-9).all()
    # Face-area proportions: the two x = +-2 end caps have area 1 each;
    # total area = 2*1 + 4*4 = 18 -> expected fraction on caps = 2/18.
    on_caps = np.abs(np.abs(pts[:, 0]) - 2.0) <= 1e-9
    frac = on_caps.mean()
    assert abs(frac - 2.0 / 18.0) < 0.01, frac


def test_sample_points_on_cad_and_corners(tmp_path):
    v, f = _cuboid()
    p = tmp_path / "m.ply"
    _write_ascii_ply_mesh(str(p), v, f)
    pts, corners_center = plymod.sample_points_on_cad(str(p), n_num=500)
    assert pts.shape == (500, 3) and corners_center.shape == (9, 3)
    np.testing.assert_allclose(corners_center[8], [0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(
        plymod.model_diameter_from_bbox(corners_center),
        np.linalg.norm([2.0, 1.0, 1.0]),
        rtol=1e-6,
    )
    assert _on_cuboid_surface(pts.astype(np.float64), tol=1e-6).all()


def test_add_on_surface_samples_matches_oracle(tmp_path):
    """ADD with surface-sampled points equals the analytic value for a pure
    translation offset (ADD == |t|) — vertex-only sampling on a low-poly mesh
    would give the same here, but the point distribution differs; this checks
    the sampled cloud plugs into the metric pipeline."""
    v, f = _cuboid()
    pts = plymod.sample_points_on_mesh(v, f, 5000, seed=2)
    gt = np.eye(4)
    pred = np.eye(4)
    pred[:3, 3] = [0.01, -0.02, 0.02]
    out = add_metrics(pts, pred, gt)
    np.testing.assert_allclose(out["add"], np.linalg.norm(pred[:3, 3]), rtol=1e-6)
    assert out["add_score"] == 1.0


def test_get_all_points_on_model_ply_parity(tmp_path):
    """.ply keeps the reference's vertices-only behavior."""
    v, f = _cuboid()
    p = tmp_path / "m.ply"
    _write_ascii_ply_mesh(str(p), v, f)
    out = plymod.get_all_points_on_model(str(p))
    np.testing.assert_allclose(out, v, atol=1e-6)


def test_get_all_points_on_model_obj_surface(tmp_path):
    v, f = _cuboid(w=2.0, h=2.0, d=2.0)
    p = tmp_path / "m.obj"
    with open(p, "w") as fh:
        for vv in v:
            fh.write(f"v {vv[0]} {vv[1]} {vv[2]}\n")
        for tri in f:
            fh.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")
    out = plymod.get_all_points_on_model(str(p))
    # normalized to 2/diag scale (reference normalize_point_cloud)
    diag = np.linalg.norm(out.max(0) - out.min(0))
    np.testing.assert_allclose(diag, 2.0, rtol=1e-2)

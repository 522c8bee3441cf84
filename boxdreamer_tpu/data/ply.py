"""Minimal PLY mesh/point reader (ascii + binary little/big endian) and
area-weighted mesh surface sampling.

Replaces the reference's open3d/trimesh/plyfile dependencies for CAD point
loading (src/utils/customize/sample_points_on_cad.py). For .ply the
reference's get_all_points_on_model reads vertices only (parity kept); for
low-poly meshes (.obj/.glb) it surface-samples via trimesh — here provided
as :func:`sample_points_on_mesh` (uniform area-weighted triangle sampling in
numpy, same semantics as open3d's ``sample_points_uniformly`` / trimesh's
``sample``). No external mesh library needed.
"""

from __future__ import annotations

import functools

import numpy as np

_DTYPES = {
    "char": "i1",
    "int8": "i1",
    "uchar": "u1",
    "uint8": "u1",
    "short": "i2",
    "int16": "i2",
    "ushort": "u2",
    "uint16": "u2",
    "int": "i4",
    "int32": "i4",
    "uint": "u4",
    "uint32": "u4",
    "float": "f4",
    "float32": "f4",
    "double": "f8",
    "float64": "f8",
}


def read_ply_vertices(path: str) -> np.ndarray:
    """Read the (N, 3) float64 xyz vertex positions of a .ply file."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        elements = []  # list of (name, count, [(prop_name, dtype_str or list-spec)])
        cur_props = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens:
                continue
            if tokens[0] == "comment":
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                cur_props = []
                elements.append((tokens[1], int(tokens[2]), cur_props))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    cur_props.append((tokens[-1], ("list", tokens[2], tokens[3])))
                else:
                    cur_props.append((tokens[-1], tokens[1]))
            elif tokens[0] == "end_header":
                break

        vert = next((e for e in elements if e[0] == "vertex"), None)
        if vert is None:
            raise ValueError(f"no vertex element in {path}")
        _, count, props = vert
        if any(isinstance(t, tuple) for _, t in props):
            raise ValueError("list properties on vertices unsupported")

        if fmt == "ascii":
            names = [n for n, _ in props]
            rows = []
            for _ in range(count):
                vals = f.readline().split()
                rows.append([float(v) for v in vals[: len(names)]])
            arr = np.asarray(rows, dtype=np.float64)
            idx = [names.index(k) for k in ("x", "y", "z")]
            return arr[:, idx]

        endian = "<" if fmt == "binary_little_endian" else ">"
        dtype = np.dtype([(n, endian + _DTYPES[t]) for n, t in props])
        # Vertex element is first in well-formed files; if not, skip preceding
        # fixed-size elements.
        for name, cnt, pr in elements:
            if name == "vertex":
                break
            if any(isinstance(t, tuple) for _, t in pr):
                raise ValueError("cannot skip list-typed element before vertices")
            skip_dtype = np.dtype([(n, endian + _DTYPES[t]) for n, t in pr])
            f.seek(cnt * skip_dtype.itemsize, 1)
        data = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
        return np.stack(
            [data["x"], data["y"], data["z"]], axis=1
        ).astype(np.float64)


def read_ply_points(path: str):
    """Read (N, 3) points and, when present, (N, 3) uint8 colors from a PLY
    point cloud (e.g. COLMAP model_converter output)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        elements = []
        cur_props = None
        while True:
            tokens = f.readline().decode("ascii", "replace").strip().split()
            if not tokens or tokens[0] == "comment":
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                cur_props = []
                elements.append((tokens[1], int(tokens[2]), cur_props))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    cur_props.append((tokens[-1], ("list", tokens[2], tokens[3])))
                else:
                    cur_props.append((tokens[-1], tokens[1]))
            elif tokens[0] == "end_header":
                break
        name, count, props = next(e for e in elements if e[0] == "vertex")
        names = [n for n, _ in props]
        has_color = all(c in names for c in ("red", "green", "blue"))
        if fmt == "ascii":
            rows = [f.readline().split() for _ in range(count)]
            xyz_idx = [names.index(k) for k in ("x", "y", "z")]
            pts = np.asarray(
                [[float(r[i]) for i in xyz_idx] for r in rows], dtype=np.float64
            )
            colors = None
            if has_color:
                c_idx = [names.index(k) for k in ("red", "green", "blue")]
                colors = np.asarray(
                    [[float(r[i]) for i in c_idx] for r in rows], dtype=np.uint8
                )
            return pts, colors
        endian = "<" if fmt != "binary_big_endian" else ">"
        dtype = np.dtype([(n, endian + _DTYPES[t]) for n, t in props])
        data = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
        pts = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float64)
        colors = None
        if has_color:
            colors = np.stack(
                [data["red"], data["green"], data["blue"]], axis=1
            ).astype(np.uint8)
        return pts, colors


def read_ply_mesh(path: str):
    """Read vertices and (triangulated) faces from a PLY file.

    Returns:
        (vertices (N, 3) float64, faces (M, 3) int64 or None when the file
        has no face element — e.g. reconstruction point clouds).
    """
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        elements = []
        cur_props = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens or tokens[0] == "comment":
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                cur_props = []
                elements.append((tokens[1], int(tokens[2]), cur_props))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    cur_props.append((tokens[-1], ("list", tokens[2], tokens[3])))
                else:
                    cur_props.append((tokens[-1], tokens[1]))
            elif tokens[0] == "end_header":
                break

        vertices, faces = None, None
        endian = "<" if fmt != "binary_big_endian" else ">"
        for name, count, props in elements:
            is_list = [isinstance(t, tuple) for _, t in props]
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    names = [n for n, _ in props]
                    idx = [names.index(k) for k in ("x", "y", "z")]
                    vertices = np.asarray(
                        [[float(r[i]) for i in idx] for r in rows], dtype=np.float64
                    )
                elif name == "face":
                    tris = []
                    for r in rows:
                        n = int(r[0])
                        poly = [int(v) for v in r[1 : 1 + n]]
                        for k in range(1, n - 1):  # fan-triangulate
                            tris.append([poly[0], poly[k], poly[k + 1]])
                    faces = np.asarray(tris, dtype=np.int64) if tris else None
            else:
                if not any(is_list):
                    dtype = np.dtype(
                        [(n, endian + _DTYPES[t]) for n, t in props]
                    )
                    buf = f.read(count * dtype.itemsize)
                    if name == "vertex":
                        data = np.frombuffer(buf, dtype=dtype, count=count)
                        vertices = np.stack(
                            [data["x"], data["y"], data["z"]], axis=1
                        ).astype(np.float64)
                else:
                    # Element with list property (faces): stream row by row.
                    tris = []
                    for _ in range(count):
                        row_vals = {}
                        for pname, ptype in props:
                            if isinstance(ptype, tuple):
                                _, cnt_t, idx_t = ptype
                                cnt_dt = np.dtype(endian + _DTYPES[cnt_t])
                                idx_dt = np.dtype(endian + _DTYPES[idx_t])
                                n = int(
                                    np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)[0]
                                )
                                vals = np.frombuffer(
                                    f.read(n * idx_dt.itemsize), idx_dt, count=n
                                )
                                row_vals[pname] = vals
                            else:
                                dt = np.dtype(endian + _DTYPES[ptype])
                                row_vals[pname] = np.frombuffer(
                                    f.read(dt.itemsize), dt
                                )[0]
                        if name == "face":
                            poly = next(
                                v
                                for k, v in row_vals.items()
                                if isinstance(v, np.ndarray)
                            )
                            for k in range(1, len(poly) - 1):
                                tris.append(
                                    [int(poly[0]), int(poly[k]), int(poly[k + 1])]
                                )
                    if name == "face" and tris:
                        faces = np.asarray(tris, dtype=np.int64)
        if vertices is None:
            raise ValueError(f"no vertex element in {path}")
        return vertices, faces


def read_obj_mesh(path: str):
    """Minimal OBJ reader: 'v' and (fan-triangulated) 'f' records."""
    verts, tris = [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(v) for v in t[1:4]])
            elif t[0] == "f":
                idx = [int(tok.split("/")[0]) for tok in t[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    tris.append([idx[0], idx[k], idx[k + 1]])
    vertices = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(tris, dtype=np.int64) if tris else None
    return vertices, faces


def sample_points_on_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    n: int,
    seed: int | None = 0,
) -> np.ndarray:
    """Uniform area-weighted surface sampling (the numpy equivalent of
    open3d ``sample_points_uniformly`` / trimesh ``sample``, used by the
    reference's sample_points_on_cad.py:36 and :105).

    Triangles are picked with probability proportional to area; points are
    uniform in each triangle via the sqrt-barycentric trick.
    """
    v = np.asarray(vertices, dtype=np.float64)
    fc = np.asarray(faces, dtype=np.int64)
    a, b, c = v[fc[:, 0]], v[fc[:, 1]], v[fc[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("mesh has zero surface area")
    rng = np.random.default_rng(seed)
    tri = rng.choice(len(fc), size=n, p=areas / total)
    r1 = np.sqrt(rng.random(n))[:, None]
    r2 = rng.random(n)[:, None]
    pts = (1 - r1) * a[tri] + r1 * (1 - r2) * b[tri] + r1 * r2 * c[tri]
    return pts


def get_model_corners(model: np.ndarray) -> np.ndarray:
    """8 axis-aligned bbox corners in the reference's order
    (sample_points_on_cad.py:6-20: x slow, y mid, z fast)."""
    mn, mx = model.min(axis=0), model.max(axis=0)
    return np.array(
        [
            [mn[0], mn[1], mn[2]],
            [mn[0], mn[1], mx[2]],
            [mn[0], mx[1], mn[2]],
            [mn[0], mx[1], mx[2]],
            [mx[0], mn[1], mn[2]],
            [mx[0], mn[1], mx[2]],
            [mx[0], mx[1], mn[2]],
            [mx[0], mx[1], mx[2]],
        ]
    )


def model_diameter_from_bbox(bbox: np.ndarray) -> float:
    """Diagonal of the model bbox (sample_points_on_cad.py:74-81)."""
    return float(np.linalg.norm(np.asarray(bbox)[7] - np.asarray(bbox)[0]))


def sample_points_on_cad(cad_model_path: str, n_num: int = 1000, seed: int = 0):
    """Surface-sample a CAD mesh + its 9x3 corners-and-center block
    (reference sample_points_on_cad.py:22-44)."""
    if cad_model_path.endswith(".obj"):
        vertices, faces = read_obj_mesh(cad_model_path)
    else:
        vertices, faces = read_ply_mesh(cad_model_path)
    corners = get_model_corners(vertices)
    center = (corners.max(0, keepdims=True) + corners.min(0, keepdims=True)) / 2
    corners_center = np.concatenate([corners, center], axis=0)
    if faces is None:
        raise ValueError(f"{cad_model_path} has no faces to sample")
    pts = sample_points_on_mesh(vertices, faces, n_num, seed=seed)
    return pts.astype(np.float32), corners_center.astype(np.float32)


def normalize_point_cloud(points: np.ndarray) -> np.ndarray:
    """Center and scale to 2/diagonal (sample_points_on_cad.py:113-146)."""
    points = np.asarray(points, dtype=np.float64).copy()
    bbox_min, bbox_max = points.min(0), points.max(0)
    diag = np.linalg.norm(bbox_max - bbox_min)
    points += -(bbox_min + bbox_max) / 2
    return points * (2.0 / diag)


@functools.lru_cache(maxsize=64)
def get_all_points_on_model(
    path: str, max_size: int = -1, surface_points: int = 10000
) -> np.ndarray:
    """Cached CAD point loading (reference get_all_points_on_model,
    sample_points_on_cad.py:148-180, and the metric/bbox caches
    metric_utils.py:212-222). Reference semantics per extension:
      .ply -> vertices only (optionally uniformly downsampled to max_size);
      .obj/.glb -> 10k surface samples, normalized to the unit-diagonal box;
      .xyz -> raw text points.
    """
    if path.endswith(".ply"):
        model = read_ply_vertices(path)
        if max_size != -1 and model.shape[0] > max_size:
            idx = np.random.default_rng(0).choice(
                model.shape[0], max_size, replace=False
            )
            model = model[idx]
        return model
    if path.endswith(".obj") or path.endswith(".glb"):
        if path.endswith(".glb"):
            raise NotImplementedError("glb parsing requires trimesh (absent)")
        vertices, faces = read_obj_mesh(path)
        if faces is None:
            return normalize_point_cloud(vertices)
        pts = sample_points_on_mesh(vertices, faces, surface_points, seed=0)
        return normalize_point_cloud(pts)
    if path.endswith(".xyz"):
        return np.loadtxt(path)
    raise NotImplementedError(f"Model format {path} not implemented")


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None):
    """Write an ascii PLY point cloud (used by the reconstruction driver)."""
    points = np.asarray(points)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]} {points[i, 1]} {points[i, 2]}"
            if colors is not None:
                c = colors[i].astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")

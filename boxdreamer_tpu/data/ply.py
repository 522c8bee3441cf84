"""Minimal PLY vertex reader (ascii + binary little/big endian).

Replaces the reference's open3d/trimesh dependency for CAD point loading
(src/utils/customize/sample_points_on_cad.py — get_all_points_on_model just
reads mesh vertices). No external mesh library needed: metric computation
and 3D-bbox extraction only consume the vertex positions.
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


@functools.lru_cache(maxsize=64)
def get_all_points_on_model(path: str) -> np.ndarray:
    """Cached CAD vertex loading (reference bbox_utils.get_cached_points:79-91
    and metric_utils.get_cached_points:212-222)."""
    return read_ply_vertices(path)


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

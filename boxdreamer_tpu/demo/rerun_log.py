"""Gated rerun-sdk logging for the demo (reference demo.py:1007-1104,1318).

rerun is not a framework dependency: :func:`init_rerun` returns None when
the SDK is absent and the demo continues without it — the same graceful
degradation the reference applies (demo.py:1318-1326). All geometry
conventions match the reference: bbox corners as 12 line strips, camera as
a Transform3D + Pinhole child, FPS as a scalar time series (with the same
API-version fallbacks).
"""

from __future__ import annotations

import numpy as np

from boxdreamer_tpu.utils.log import INFO, WARNING

# The reference's corner-pair list (demo.py:1050-1063).
BOX_EDGES = (
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
)


def init_rerun(app_name: str = "BoxDreamer", spawn: bool = True):
    """Import + init rerun; returns the module, or None when unavailable."""
    try:
        import rerun as rr
    except ImportError:
        WARNING("rerun not installed (pip install rerun-sdk); disabled")
        return None
    rr.init(app_name, spawn=spawn)
    INFO("Rerun enabled")
    return rr


def log_frame(
    rr,
    frame_idx: int,
    query_frame: np.ndarray,
    ref_images=None,
    pose: np.ndarray | None = None,
    intrinsics: np.ndarray | None = None,
    bbox_3d: np.ndarray | None = None,
    fps: float | None = None,
    points: np.ndarray | None = None,
    point_colors: np.ndarray | None = None,
):
    """Log one demo frame to rerun (no-op fields skipped).

    Mirrors the reference log_to_rerun (demo.py:1007-1104): query/ref
    images, optional reconstruction point cloud, the 3D box as line
    strips, the camera transform + pinhole, and the FPS scalar.
    """
    rr.set_time_sequence("frame", frame_idx)
    rr.log("query/image", rr.Image(np.asarray(query_frame)))

    for i, ref in enumerate(ref_images or ()):
        rr.log(f"references/ref_{i}", rr.Image(np.asarray(ref)))

    if points is not None and len(points):
        pts = np.asarray(points, np.float32)
        if point_colors is not None:
            cols = (np.asarray(point_colors) * 255).astype(np.uint8)
            rr.log("3d/point_cloud", rr.Points3D(pts, colors=cols))
        else:
            rr.log("3d/point_cloud", rr.Points3D(pts))

    if bbox_3d is not None:
        box = np.asarray(bbox_3d)
        lines = [[box[a], box[b]] for a, b in BOX_EDGES]
        rr.log("3d/bbox", rr.LineStrips3D(lines, colors=[255, 0, 0, 255]))

    if pose is not None:
        try:
            rr.log(
                "3d/camera",
                rr.Transform3D(translation=pose[:3, 3], mat3x3=pose[:3, :3]),
            )
            if intrinsics is not None:
                h, w = np.asarray(query_frame).shape[:2]
                rr.log(
                    "3d/camera/pinhole",
                    rr.Pinhole(
                        resolution=[w, h],
                        focal_length=[float(intrinsics[0, 0]),
                                      float(intrinsics[1, 1])],
                        principal_point=[float(intrinsics[0, 2]),
                                         float(intrinsics[1, 2])],
                    ),
                )
        except Exception as e:  # noqa: BLE001 — reference demo.py:1093
            WARNING(f"Camera logging failed: {e}")

    if fps is not None:
        # API fallbacks across rerun versions (reference demo.py:1097-1104).
        try:
            rr.log("stats/fps", rr.TimeSeriesScalar(fps))
        except AttributeError:
            try:
                rr.log("stats/fps", rr.Scalar(fps))
            except AttributeError:
                rr.log("stats/fps_text", rr.TextLog(f"FPS: {fps:.1f}"))

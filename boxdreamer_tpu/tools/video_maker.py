"""Frames-dir <-> video CLI (reference scripts/tools/video_maker.py:1-105 and
src/demo/preprocess_video.py:1-118), on the dependency-free MJPEG-AVI codec
in boxdreamer_tpu/utils/video.py.

Usage:
    python -m boxdreamer_tpu.tools.video_maker make  FRAMES_DIR OUT.avi [--fps 30]
    python -m boxdreamer_tpu.tools.video_maker split VIDEO.avi OUT_DIR [--stride 1]
    python -m boxdreamer_tpu.tools.video_maker probe VIDEO.avi
"""

from __future__ import annotations

import argparse

from boxdreamer_tpu.utils import video as V


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    mk = sub.add_parser("make", help="images dir -> MJPEG-AVI")
    mk.add_argument("frames_dir")
    mk.add_argument("output")
    mk.add_argument("--fps", type=float, default=30.0)
    mk.add_argument("--quality", type=int, default=90)

    sp = sub.add_parser("split", help="MJPEG-AVI -> frames dir")
    sp.add_argument("video")
    sp.add_argument("out_dir")
    sp.add_argument("--stride", type=int, default=1)
    sp.add_argument("--max-frames", type=int, default=None)

    pr = sub.add_parser("probe", help="print frame count / fps / size")
    pr.add_argument("video")

    a = p.parse_args(argv)
    if a.cmd == "make":
        n = V.frames_to_video(a.frames_dir, a.output, fps=a.fps, quality=a.quality)
        print(f"wrote {n} frames -> {a.output}")
    elif a.cmd == "split":
        n = V.video_to_frames(a.video, a.out_dir, stride=a.stride,
                              max_frames=a.max_frames)
        print(f"extracted {n} frames -> {a.out_dir}")
    else:
        total, fps, (w, h) = V.probe_video(a.video)
        print(f"{a.video}: {total} frames @ {fps:g} fps, {w}x{h}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

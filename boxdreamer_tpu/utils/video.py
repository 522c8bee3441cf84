"""Dependency-free video IO: Motion-JPEG AVI writer/reader in pure Python.

The reference stack leans on OpenCV/ffmpeg for its video surface
(scripts/tools/video_maker.py:1-105 frames->mp4,
src/demo/preprocess_video.py:1-118 video->frames,
src/demo/utils.py load_video) — neither cv2's codecs nor ffmpeg exist in
this image, so we implement the one container+codec pair that needs no
native code: MJPEG inside AVI (every frame an independent JPEG; PIL does the
JPEG part). That keeps the demo/tooling video surface real:

  * :func:`write_video` / :class:`MJPEGWriter` — frames -> .avi
  * :func:`read_video` / :func:`probe_video` — .avi -> frames (+ fps)
  * :func:`frames_to_video` / :func:`video_to_frames` — the video_maker /
    preprocess_video CLI equivalents (boxdreamer_tpu/tools/video_maker.py).

MJPEG-AVI is universally decodable (VLC/ffmpeg/browsers via conversion), so
artifacts produced on the TPU host remain portable.

Format notes (RIFF/AVI, verified against the ffmpeg demuxer source docs):
RIFF('AVI ') { LIST('hdrl'){ 'avih', LIST('strl'){ 'strh','strf' } },
LIST('movi'){ '00dc' <jpeg> ... }, 'idx1' }. All sizes little-endian; chunks
pad to even length.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np


def _u32(x: int) -> bytes:
    return struct.pack("<I", x)


def _fourcc(tag: str) -> bytes:
    return tag.encode("ascii")


class MJPEGWriter:
    """Streaming MJPEG-AVI writer (constant memory in frame count).

    Seeks back to patch the RIFF/movi sizes and frame counts on close, so it
    needs a real seekable file.
    """

    def __init__(self, path: str, fps: float = 30.0, quality: int = 90):
        self.path = path
        self.fps = float(fps)
        self.quality = int(quality)
        self._f = None
        self._size: Optional[Tuple[int, int]] = None  # (w, h)
        self._offsets: List[Tuple[int, int]] = []  # (offset-in-movi, size)
        self._count = 0

    # -- container plumbing -------------------------------------------------

    def _write_headers(self, w: int, h: int) -> None:
        f = self._f
        us_per_frame = int(round(1e6 / self.fps))
        f.write(_fourcc("RIFF") + _u32(0) + _fourcc("AVI "))  # patched later

        # LIST hdrl
        avih = (
            _u32(us_per_frame)
            + _u32(0)  # max bytes/sec (0 = unspecified)
            + _u32(0)  # padding granularity
            + _u32(0x10)  # flags: AVIF_HASINDEX
            + _u32(0)  # total frames (patched)
            + _u32(0)  # initial frames
            + _u32(1)  # streams
            + _u32(0)  # suggested buffer size
            + _u32(w)
            + _u32(h)
            + _u32(0) * 4  # reserved
        )
        strh = (
            _fourcc("vids")
            + _fourcc("MJPG")
            + _u32(0)  # flags
            + struct.pack("<HH", 0, 0)  # priority, language
            + _u32(0)  # initial frames
            + _u32(1000)  # scale
            + _u32(int(round(self.fps * 1000)))  # rate -> fps = rate/scale
            + _u32(0)  # start
            + _u32(0)  # length (patched)
            + _u32(0)  # suggested buffer size
            + _u32(0xFFFFFFFF)  # quality
            + _u32(0)  # sample size
            + struct.pack("<hhhh", 0, 0, w, h)  # rcFrame
        )
        strf = struct.pack(  # BITMAPINFOHEADER
            "<IiiHH4sIiiII",
            40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
        )
        strl = (
            _fourcc("LIST")
            + _u32(4 + 8 + len(strh) + 8 + len(strf))
            + _fourcc("strl")
            + _fourcc("strh") + _u32(len(strh)) + strh
            + _fourcc("strf") + _u32(len(strf)) + strf
        )
        hdrl_body = _fourcc("hdrl") + _fourcc("avih") + _u32(len(avih)) + avih + strl
        f.write(_fourcc("LIST") + _u32(len(hdrl_body)) + hdrl_body)

        # LIST movi (size patched on close)
        self._movi_size_pos = f.tell() + 4
        f.write(_fourcc("LIST") + _u32(0) + _fourcc("movi"))
        self._movi_start = f.tell()

    def append(self, frame: np.ndarray) -> None:
        """Append one (H, W, 3) uint8 RGB frame (or (H, W) grayscale)."""
        from PIL import Image

        frame = np.asarray(frame)
        if frame.dtype != np.uint8:
            frame = np.clip(frame, 0, 255).astype(np.uint8)
        if frame.ndim == 2:
            frame = np.stack([frame] * 3, axis=-1)
        h, w = frame.shape[:2]
        if self._f is None:
            self._f = open(self.path, "wb")
            self._size = (w, h)
            self._write_headers(w, h)
        elif (w, h) != self._size:
            raise ValueError(f"frame size {(w, h)} != first frame {self._size}")

        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=self.quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        off = self._f.tell() - self._movi_start + 4  # idx1 offsets from 'movi'
        self._f.write(_fourcc("00dc") + _u32(len(data)) + data)
        self._offsets.append((off, len(data)))
        self._count += 1

    def close(self) -> None:
        if self._f is None:
            raise ValueError("no frames written")
        f = self._f
        movi_end = f.tell()

        # idx1: one entry per frame (AVIIF_KEYFRAME = 0x10).
        f.write(_fourcc("idx1") + _u32(16 * self._count))
        for off, size in self._offsets:
            f.write(_fourcc("00dc") + _u32(0x10) + _u32(off) + _u32(size))
        riff_end = f.tell()

        f.seek(4)
        f.write(_u32(riff_end - 8))
        f.seek(self._movi_size_pos)
        f.write(_u32(movi_end - self._movi_start + 4))
        # avih total frames: RIFF(12) + LIST hdr(12) + 'avih'+size(8) + 16
        f.seek(12 + 12 + 8 + 16)
        f.write(_u32(self._count))
        # strh length: locate = 12+12+8+avih(56) + LIST strl hdr(12) + 'strh'+size(8) + 32
        f.seek(12 + 12 + 8 + 56 + 12 + 8 + 32)
        f.write(_u32(self._count))
        f.close()
        self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._f is not None:
            self.close()


def write_video(path: str, frames: Iterable[np.ndarray], fps: float = 30.0,
                quality: int = 90) -> int:
    """Write RGB frames to an MJPEG .avi; returns the frame count."""
    with MJPEGWriter(path, fps=fps, quality=quality) as w:
        n = 0
        for fr in frames:
            w.append(fr)
            n += 1
    return n


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _iter_chunks(data: bytes, start: int, end: int) -> Iterator[Tuple[str, int, int]]:
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk range."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos:pos + 4].decode("latin-1")
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def probe_video(path: str) -> Tuple[int, float, Tuple[int, int]]:
    """Return (num_frames, fps, (width, height)) of an MJPEG-AVI."""
    with open(path, "rb") as f:
        head = f.read(12 + 12 + 8 + 56 + 12 + 8 + 64)
    if head[:4] != b"RIFF" or head[8:12] != b"AVI ":
        raise ValueError(f"{path}: not an AVI file")
    us_per_frame, _, _, _, total = struct.unpack("<5I", head[32:52])
    w, h = struct.unpack("<II", head[64:72])
    fps = 1e6 / us_per_frame if us_per_frame else 30.0
    return total, fps, (w, h)


def read_video(path: str, max_frames: Optional[int] = None) -> Tuple[List[np.ndarray], float]:
    """Decode an MJPEG-AVI into a list of (H, W, 3) uint8 RGB frames.

    Only the MJPG codec is supported — other codecs raise with a pointer to
    use a frames directory instead (mirrors the demo's gating).
    """
    from PIL import Image

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError(f"{path}: not an AVI file")
    _, fps, _ = probe_video(path)

    frames: List[np.ndarray] = []
    for tag, start, size in _iter_chunks(data, 12, len(data)):
        if tag != "LIST":
            continue
        list_type = data[start:start + 4]
        if list_type != b"movi":
            continue
        for ctag, cstart, csize in _iter_chunks(data, start + 4, start + size):
            if ctag[2:] not in ("dc", "db"):
                continue
            payload = data[cstart:cstart + csize]
            if not payload.startswith(b"\xff\xd8"):
                raise ValueError(
                    f"{path}: stream is not MJPEG — re-encode to MJPEG-AVI or "
                    "extract frames to a directory"
                )
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            frames.append(np.asarray(img))
            if max_frames is not None and len(frames) >= max_frames:
                return frames, fps
    return frames, fps


# ---------------------------------------------------------------------------
# frames-dir <-> video (video_maker.py / preprocess_video.py equivalents)
# ---------------------------------------------------------------------------

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".webp")


def list_frame_files(folder: str) -> List[str]:
    """Sorted image files in a directory (reference video_maker.py:19-37,
    case-insensitive extensions, name-sorted)."""
    files = [
        os.path.join(folder, n)
        for n in sorted(os.listdir(folder))
        if n.lower().endswith(IMAGE_EXTS)
    ]
    return files


def frames_to_video(image_folder: str, output_file: str, fps: float = 30.0,
                    quality: int = 90) -> int:
    """Create an MJPEG-AVI from a directory of images
    (reference scripts/tools/video_maker.py:9-105; mismatched frames are
    resized to the first frame's size like the reference does)."""
    from PIL import Image

    files = list_frame_files(image_folder)
    if not files:
        raise FileNotFoundError(f"no images in {image_folder}")
    first = Image.open(files[0]).convert("RGB")
    size = first.size

    def gen():
        for p in files:
            img = Image.open(p).convert("RGB")
            if img.size != size:
                img = img.resize(size)
            yield np.asarray(img)

    return write_video(output_file, gen(), fps=fps, quality=quality)


def video_to_frames(video_path: str, out_dir: str, stride: int = 1,
                    fmt: str = "{:06d}.png", max_frames: Optional[int] = None) -> int:
    """Extract frames from an MJPEG-AVI to a directory
    (reference src/demo/preprocess_video.py:1-118 downsample/stride flow)."""
    from PIL import Image

    frames, _ = read_video(video_path, max_frames=None)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for i, fr in enumerate(frames[::stride]):
        Image.fromarray(fr).save(os.path.join(out_dir, fmt.format(i)))
        n += 1
        if max_frames is not None and n >= max_frames:
            break
    return n


# ---------------------------------------------------------------------------
# ffmpeg-gated mp4 export (reference demo.py:1630-1650 writes an mp4 via
# cv2.VideoWriter; here MJPEG-AVI is the native format and mp4 is a
# conversion step available only when an ffmpeg binary exists on the host)
# ---------------------------------------------------------------------------


def ffmpeg_available() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def convert_to_mp4(avi_path: str, mp4_path: Optional[str] = None,
                   crf: int = 20) -> str:
    """Convert an MJPEG-AVI to H.264 mp4 by shelling out to ffmpeg.

    Raises RuntimeError when no ffmpeg binary is on PATH (this image has
    none) — callers should gate on :func:`ffmpeg_available`.
    """
    import subprocess

    if mp4_path is None:
        mp4_path = os.path.splitext(avi_path)[0] + ".mp4"
    if not ffmpeg_available():
        raise RuntimeError(
            "mp4 export needs an ffmpeg binary on PATH; the MJPEG .avi at "
            f"{avi_path} is already playable as-is"
        )
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", avi_path,
         "-c:v", "libx264", "-pix_fmt", "yuv420p", "-crf", str(crf), mp4_path],
        check=True,
    )
    return mp4_path


# ---------------------------------------------------------------------------
# tracked temp frame dirs: video decode paths extract frames to disk; track
# the dirs so demo/gradio runs can clean up instead of leaking PNGs
# ---------------------------------------------------------------------------

_TEMP_FRAME_DIRS: List[str] = []


def make_temp_frames_dir(prefix: str = "frames_") -> str:
    """mkdtemp that is registered for cleanup_temp_frame_dirs() and removed
    at interpreter exit as a backstop."""
    import atexit
    import tempfile

    if not _TEMP_FRAME_DIRS:
        atexit.register(cleanup_temp_frame_dirs)
    d = tempfile.mkdtemp(prefix=prefix)
    _TEMP_FRAME_DIRS.append(d)
    return d


def cleanup_temp_frame_dirs() -> None:
    import shutil

    while _TEMP_FRAME_DIRS:
        d = _TEMP_FRAME_DIRS.pop()
        shutil.rmtree(d, ignore_errors=True)


def load_frames_any(path: str, max_frames: Optional[int] = None) -> List[np.ndarray]:
    """Demo-facing loader: a frames directory, a single image, or an
    MJPEG-AVI (reference demo load_video semantics, src/demo/utils.py)."""
    from PIL import Image

    if os.path.isdir(path):
        return [
            np.asarray(Image.open(p).convert("RGB"))
            for p in list_frame_files(path)[: max_frames or None]
        ]
    if path.lower().endswith(".avi"):
        return read_video(path, max_frames=max_frames)[0]
    if path.lower().endswith(IMAGE_EXTS):
        return [np.asarray(Image.open(path).convert("RGB"))]
    raise ValueError(
        f"{path}: unsupported video container (only MJPEG-AVI decodes without "
        "ffmpeg; pass a frames directory for other formats)"
    )

"""Gradio demo handlers — the full two-mode stateful flow, gradio-free.

Equivalent of the reference web UI's handler layer (src/demo/gradio_demo.py:
101-1666): every step of both modes is a pure-ish function over a plain
state dict, so the flow is unit-testable without gradio installed and the
UI layer (gradio_demo.py) is just wiring.

Mode 1 (single video / frame dir, reference :101-875):
    load_video -> toggle_mode -> annotate_image* -> start_segmentation ->
    extract_frames -> load_all_frames -> select_reference_image* ->
    confirm_selection -> start_reconstruction -> run_prediction
Mode 2 (reference images + query video, reference :876-1666):
    process_ref_images / process_test_video -> per-side annotation +
    segmentation -> process_and_predict

Heavy stages are injectable (segmenter, reconstructor, predictor) — the
defaults use the framework's ThresholdSegmenter / VisualHull / DemoPipeline,
with SAM2 / GroundingDINO / DUSt3R gated exactly like the CLI demo.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from boxdreamer_tpu.demo.pipeline import DemoConfig, DemoPipeline, load_frames
from boxdreamer_tpu.demo.segmentation import BaseSegmenter, build_segmenter
from boxdreamer_tpu.utils.log import INFO


def _side(state: Dict, which: str) -> Dict:
    return state.setdefault(which, _empty_side())


def _empty_side() -> Dict:
    return {
        "frames": [],  # list of file paths
        "annotation_mode": "point",  # 'point' | 'bbox'
        "points": [],  # [(x, y, label)]
        "boxes": [],  # [(x0, y0, x1, y1)]
        "_pending_corner": None,
        "masks": None,  # list of (H, W) float arrays
        "status": "",
    }


def init_state() -> Dict:
    """Fresh demo state (reference init_state, gradio_demo.py:1974)."""
    return {
        "mode1": _empty_side(),
        "mode2_ref": _empty_side(),
        "mode2_test": _empty_side(),
        "extracted": [],  # candidate reference frame indices (mode 1)
        "selected_refs": [],  # confirmed reference indices
        "reconstruction": None,  # {'points', 'bbox_3d', 'ply'}
        "prediction": None,  # {'overlays', 'fps'}
        "status": "ready",
    }


# ------------------------------------------------------------------ loading


def load_video(path: str, state: Dict, which: str = "mode1") -> Dict:
    """Load a frames directory or video file (reference load_video,
    gradio_demo.py:101-163). Video decode is gated on imageio/ffmpeg."""
    side = _side(state, which)
    if not path or not os.path.exists(path):
        side["status"] = f"path not found: {path!r}"
        return state
    if os.path.isdir(path):
        side["frames"] = load_frames(path)
    elif os.path.splitext(path)[1].lower() == ".avi":
        # MJPEG-AVI decodes natively (utils/video.py) — no ffmpeg needed.
        from boxdreamer_tpu.utils.video import (make_temp_frames_dir,
                                                video_to_frames)

        tmp = make_temp_frames_dir(prefix="gradio_video_")
        video_to_frames(path, tmp)
        side["frames"] = load_frames(tmp)
    elif os.path.splitext(path)[1].lower() in (".mp4", ".mov", ".webm"):
        try:
            import imageio.v3 as iio  # noqa: PLC0415
        except ImportError:
            side["status"] = (
                "mp4/mov/webm decode needs imageio/ffmpeg (absent); "
                "pass an MJPEG .avi or a directory of frames instead"
            )
            return state
        from boxdreamer_tpu.utils.video import make_temp_frames_dir

        tmp = make_temp_frames_dir(prefix="gradio_video_")
        for i, frame in enumerate(iio.imiter(path)):
            Image.fromarray(frame).save(os.path.join(tmp, f"{i:05d}.png"))
        side["frames"] = load_frames(tmp)
    else:
        side["frames"] = [path]
    side["points"], side["boxes"] = [], []
    side["masks"] = None
    side["status"] = f"loaded {len(side['frames'])} frames"
    return state


def first_frame(state: Dict, which: str = "mode1") -> Optional[Image.Image]:
    side = _side(state, which)
    if not side["frames"]:
        return None
    return Image.open(side["frames"][0]).convert("RGB")


# --------------------------------------------------------------- annotation


def toggle_mode(mode: str, state: Dict, which: str = "mode1") -> Dict:
    """Switch point/bbox annotation mode (reference toggle_mode /
    mode2_toggle_*_mode)."""
    assert mode in ("point", "bbox"), mode
    side = _side(state, which)
    side["annotation_mode"] = mode
    side["_pending_corner"] = None
    side["status"] = f"annotation mode: {mode}"
    return state


def annotate_image(
    xy: Tuple[float, float], state: Dict, which: str = "mode1", label: int = 1
) -> Dict:
    """Record a click (reference annotate_image, gradio_demo.py:195-243):
    point mode appends a labeled point; bbox mode pairs two clicks into a
    box."""
    side = _side(state, which)
    x, y = float(xy[0]), float(xy[1])
    if side["annotation_mode"] == "point":
        side["points"].append((x, y, int(label)))
        side["status"] = f"{len(side['points'])} points"
    else:
        if side["_pending_corner"] is None:
            side["_pending_corner"] = (x, y)
            side["status"] = "bbox: first corner set"
        else:
            x0, y0 = side["_pending_corner"]
            side["_pending_corner"] = None
            box = (min(x0, x), min(y0, y), max(x0, x), max(y0, y))
            side["boxes"].append(box)
            side["status"] = f"{len(side['boxes'])} boxes"
    return state


def reset_annotations(state: Dict, which: str = "mode1") -> Dict:
    side = _side(state, which)
    side["points"], side["boxes"] = [], []
    side["_pending_corner"] = None
    side["status"] = "annotations cleared"
    return state


def draw_annotations(
    img: Image.Image, state: Dict, which: str = "mode1"
) -> Image.Image:
    """Render the current points/boxes onto the canvas image (reference
    annotate_image's redraw)."""
    side = _side(state, which)
    out = img.convert("RGB").copy()
    draw = ImageDraw.Draw(out)
    for x, y, label in side["points"]:
        color = (0, 230, 0) if label == 1 else (230, 0, 0)
        draw.ellipse([x - 4, y - 4, x + 4, y + 4], outline=color, width=2)
    for box in side["boxes"]:
        draw.rectangle(list(box), outline=(0, 160, 255), width=2)
    return out


# ------------------------------------------------------------- segmentation


def start_segmentation(
    state: Dict,
    which: str = "mode1",
    segmenter: Optional[BaseSegmenter] = None,
    segmenter_name: str = "threshold",
) -> Dict:
    """Segment every loaded frame, seeded by the annotations (reference
    start_segmentation / mode2_segment_*, gradio_demo.py:265-327). SAM2 /
    GroundingDINO are gated; the built-in threshold segmenter needs none."""
    side = _side(state, which)
    if not side["frames"]:
        side["status"] = "load frames first"
        return state
    seg = segmenter or build_segmenter(segmenter_name)
    frames = [Image.open(f).convert("RGB") for f in side["frames"]]
    points = [(x, y) for x, y, _ in side["points"]] or None
    labels = [l for _, _, l in side["points"]] or None
    boxes = side["boxes"] or None
    side["masks"] = seg.segment(frames, points=points, labels=labels, boxes=boxes)
    side["status"] = f"segmented {len(side['masks'])} frames"
    return state


def mask_overlays(
    state: Dict, which: str = "mode1", max_items: int = 16
) -> List[Image.Image]:
    side = _side(state, which)
    if side["masks"] is None:
        return []
    out = []
    for f, m in list(zip(side["frames"], side["masks"]))[:max_items]:
        img = np.asarray(Image.open(f).convert("RGB"), dtype=np.float64)
        m3 = np.asarray(m, dtype=np.float64)
        if m3.ndim == 3:
            m3 = m3.squeeze()
        tint = img * 0.5 + np.stack(
            [m3 * 255, m3 * 80, np.zeros_like(m3)], axis=-1
        ) * 0.5
        out.append(Image.fromarray(np.clip(tint, 0, 255).astype(np.uint8)))
    return out


# -------------------------------------------------------- reference picking


def extract_frames(state: Dict, stride: Optional[int] = None) -> Dict:
    """Candidate reference frames (reference extract_frames,
    gradio_demo.py:328-366): uniform stride over the segmented video."""
    side = _side(state, "mode1")
    n = len(side["frames"])
    if n == 0:
        state["status"] = "load frames first"
        return state
    stride = stride or max(n // 16, 1)
    state["extracted"] = list(range(0, n, stride))
    state["status"] = f"{len(state['extracted'])} candidate frames"
    return state


def load_all_frames(ref_num: int, state: Dict) -> List[int]:
    """Candidate list for the selection gallery (reference load_all_frames,
    gradio_demo.py:367-404)."""
    if not state["extracted"]:
        extract_frames(state)
    return state["extracted"]


def select_reference_image(index: int, ref_num: int, state: Dict) -> Dict:
    """Toggle a candidate's selection (reference select_reference_image,
    gradio_demo.py:405-447), capped at ref_num."""
    sel = state["selected_refs"]
    if index in sel:
        sel.remove(index)
    elif len(sel) < ref_num:
        sel.append(index)
    state["status"] = f"{len(sel)}/{ref_num} references selected"
    return state


def reset_selection(state: Dict) -> Dict:
    state["selected_refs"] = []
    state["status"] = "selection cleared"
    return state


def confirm_selection(ref_num: int, state: Dict) -> Dict:
    """Finalize references (reference confirm_selection, gradio_demo.py:
    461-575): pad an under-selection uniformly from the candidates."""
    sel = list(state["selected_refs"])
    cands = state["extracted"] or list(range(len(_side(state, "mode1")["frames"])))
    for c in np.linspace(0, len(cands) - 1, num=ref_num).astype(int):
        if len(sel) >= ref_num:
            break
        if cands[c] not in sel:
            sel.append(cands[c])
    state["selected_refs"] = sorted(sel[:ref_num])
    state["status"] = f"confirmed {len(state['selected_refs'])} references"
    return state


# ------------------------------------------------------ reconstruction/pred


def start_reconstruction(
    reconstructor_name: str,
    state: Dict,
    reconstructor=None,
    output_dir: Optional[str] = None,
) -> Dict:
    """Reconstruct the object from the selected reference frames (reference
    start_reconstruction, gradio_demo.py:576-698). Backends: 'carve'
    (visual hull; needs *-pose.txt next to frames), 'dust3r'/'colmap'
    (gated). A custom reconstructor instance may be injected."""
    side = _side(state, "mode1")
    sel = state["selected_refs"]
    if not sel:
        state["status"] = "confirm reference selection first"
        return state
    if side["masks"] is None:
        state["status"] = "run segmentation first"
        return state
    if reconstructor is None:
        from boxdreamer_tpu.reconstruction.main import build_reconstructor

        reconstructor = build_reconstructor(reconstructor_name)

    from boxdreamer_tpu.demo.pipeline import default_intrinsics

    frames = [Image.open(side["frames"][i]).convert("RGB") for i in sel]
    K = default_intrinsics(frames[0].size)
    poses = []
    for i in sel:
        pf = os.path.splitext(side["frames"][i])[0] + "-pose.txt"
        if os.path.exists(pf):
            pose = np.loadtxt(pf)
            if pose.shape == (3, 4):
                pose = np.vstack([pose, [0, 0, 0, 1]])
            poses.append(pose)
    if len(poses) != len(sel):
        state["status"] = (
            "reference poses unavailable; carve needs *-pose.txt "
            "(DUSt3R pose estimation is gated in this build)"
        )
        return state
    images = np.stack(
        [np.asarray(f, dtype=np.float32).transpose(2, 0, 1) / 255 for f in frames]
    )
    masks = np.stack([np.asarray(side["masks"][i], dtype=np.float32) for i in sel])
    if masks.ndim == 3:
        masks = masks[:, None]
    reconstructor.set_processed_data(
        {
            "images": images[None],
            "image_masks": masks[None],
            "non_ndc_intrinsics": np.tile(K, (1, len(sel), 1, 1)),
            "poses": np.stack(poses)[None],
        }
    )
    out_dir = output_dir or tempfile.mkdtemp(prefix="gradio_recon_")
    result = reconstructor.run(output_ply=os.path.join(out_dir, "object.ply"))
    state["reconstruction"] = {
        "points": result["points"],
        "bbox_3d": result["bbox_3d"],
        "ply": os.path.join(out_dir, "object.ply"),
    }
    state["status"] = f"reconstructed {len(result['points'])} points"
    return state


def run_prediction(
    state: Dict,
    pipeline: Optional[DemoPipeline] = None,
    model=None,
    params=None,
    output_dir: Optional[str] = None,
    which: str = "mode1",
) -> Dict:
    """Per-frame pose prediction over the loaded frames (reference
    run_boxdreamer_prediction, gradio_demo.py:699-875) through the same
    DemoPipeline the CLI uses."""
    side = _side(state, which)
    if not side["frames"]:
        state["status"] = "load frames first"
        return state
    if pipeline is None:
        assert model is not None and params is not None
        pipeline = DemoPipeline(model, params, DemoConfig())
    frames_dir = os.path.dirname(side["frames"][0])
    out_dir = output_dir or tempfile.mkdtemp(prefix="gradio_pred_")
    result = pipeline.run(frames_dir, out_dir)
    overlays = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("overlay_")
    )
    state["prediction"] = {
        "overlays": overlays,
        "fps": result.get("fps"),
        "output_dir": out_dir,
    }
    state["status"] = f"predicted {len(overlays)} frames"
    return state


# ----------------------------------------------------------------- mode 2


def process_ref_images(paths: Sequence[str], state: Dict) -> Dict:
    """Load uploaded reference images (reference process_ref_images,
    gradio_demo.py:876-934)."""
    side = _side(state, "mode2_ref")
    side["frames"] = [str(p) for p in paths]
    side["masks"] = None
    side["status"] = f"{len(side['frames'])} reference images"
    return state


def process_test_video(path: str, state: Dict) -> Dict:
    """Load the query video/frames (reference process_test_video,
    gradio_demo.py:935-976)."""
    return load_video(path, state, which="mode2_test")


def mode2_segment_ref_images(state: Dict, segmenter=None) -> Dict:
    return start_segmentation(state, which="mode2_ref", segmenter=segmenter)


def mode2_segment_test_video(state: Dict, segmenter=None) -> Dict:
    return start_segmentation(state, which="mode2_test", segmenter=segmenter)


def mode2_process_and_predict(
    reconstructor_name: str,
    state: Dict,
    pipeline: Optional[DemoPipeline] = None,
    model=None,
    params=None,
    output_dir: Optional[str] = None,
) -> Dict:
    """Mode 2 one-shot: reconstruct from the uploaded references, then track
    the query frames (reference mode2_process_and_predict,
    gradio_demo.py:1284-1665). The query frames take the mode-1 prediction
    path with the mode2_test side."""
    ref = _side(state, "mode2_ref")
    test = _side(state, "mode2_test")
    if not ref["frames"] or not test["frames"]:
        state["status"] = "upload references and a query video first"
        return state
    # References become the selected set of a synthetic mode-1 flow.
    state["mode1"] = dict(ref)
    state["selected_refs"] = list(range(len(ref["frames"])))
    if ref["masks"] is None:
        start_segmentation(state, which="mode1")
    state = start_reconstruction(reconstructor_name, state, output_dir=output_dir)
    if state["reconstruction"] is None:
        return state
    return run_prediction(
        state, pipeline=pipeline, model=model, params=params,
        output_dir=output_dir, which="mode2_test",
    )

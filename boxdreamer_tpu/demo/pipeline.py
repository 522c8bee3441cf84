"""Demo pipeline: frames -> segmentation -> refs -> reconstruction -> tracking.

Equivalent of the reference CLI demo flow (src/demo/demo.py:1241-1681):

  1. load frames (directory of images; video decode is gated on an ffmpeg
     binary, src/demo/utils.py's cv2 path has no in-image equivalent here),
  2. segment every frame (pluggable backend, demo/segmentation.py),
  3. pick N reference frames (uniform over the sequence, or FPS over camera
     centers when reference poses exist),
  4. square-crop + resize refs and queries around the masks
     (demo.py preprocess_image:349-540),
  5. obtain reference poses + object box: from sibling ``*-pose.txt`` files
     (demo writes these like the reference, demo.py:1409-1425) or via the
     DUSt3R backend; the 3D box comes from the reconstruction,
  6. per-frame pose tracking with cached reference tokens
     (models/predictor.py), box overlay rendering and FPS measurement
     (demo.py:1499-1612).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from boxdreamer_tpu.data import preprocess as pp
from boxdreamer_tpu.data.sampling import farthest_point_sample_cameras
from boxdreamer_tpu.demo.segmentation import BaseSegmenter, build_segmenter
from boxdreamer_tpu.utils.log import INFO, WARNING
from boxdreamer_tpu.utils.profiling import FPSMeter
from boxdreamer_tpu.utils import vis

IMG_EXTS = (".png", ".jpg", ".jpeg")


@dataclasses.dataclass
class DemoConfig:
    image_size: int = 224
    num_refs: int = 5
    segmenter: str = "threshold"
    frame_stride: int = 1
    focal_scale: float = 1.2  # default-intrinsics heuristic: f = scale*max(W,H)
    reconstruction_backend: str = "carve"
    output_fps_window: int = 10
    # Overlay video export (reference demo.py:1630-1650 mp4 export; here
    # MJPEG-AVI so it works without ffmpeg).
    export_video: bool = False
    video_fps: float = 15.0
    # Rerun live visualization (reference demo.py --rerun flag; gated on the
    # SDK being installed — see demo/rerun_log.py).
    use_rerun: bool = False


def load_frames(path: str, stride: int = 1) -> List[str]:
    """Frames from a directory (sorted) or an MJPEG-AVI video (decoded to a
    temp dir via utils/video.py — reference demo video->frames flow,
    src/demo/preprocess_video.py). Other containers require ffmpeg."""
    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*"))
            if f.lower().endswith(IMG_EXTS)
        )
        return files[::stride]
    if path.lower().endswith(".avi"):
        from boxdreamer_tpu.utils.video import (make_temp_frames_dir,
                                                video_to_frames)

        tmp = make_temp_frames_dir(prefix="demo_video_")
        video_to_frames(path, tmp, stride=stride)
        return sorted(glob.glob(os.path.join(tmp, "*.png")))
    raise SystemExit(
        f"{path} is not a frame directory or MJPEG .avi; other video "
        "containers require an ffmpeg binary which is not present — "
        "extract frames first"
    )


def default_intrinsics(size_wh, focal_scale: float = 1.2) -> np.ndarray:
    w, h = size_wh
    f = focal_scale * max(w, h)
    return np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1.0]])


class DemoPipeline:
    def __init__(self, model, params, config: DemoConfig = DemoConfig(),
                 segmenter: Optional[BaseSegmenter] = None):
        self.model = model
        self.params = params
        self.config = config
        self.segmenter = segmenter or build_segmenter(config.segmenter)

    # ------------------------------------------------------------ reference

    def _select_refs(
        self, n_frames: int, pose_files: Sequence[Optional[str]]
    ) -> np.ndarray:
        cfg = self.config
        have_poses = all(p and os.path.exists(p) for p in pose_files)
        if have_poses:
            centers = []
            for p in pose_files:
                pose = np.loadtxt(p)
                if pose.shape == (3, 4):
                    pose = np.vstack([pose, [0, 0, 0, 1]])
                centers.append(-pose[:3, :3].T @ pose[:3, 3])
            return farthest_point_sample_cameras(np.asarray(centers), cfg.num_refs)
        return np.linspace(0, n_frames - 1, num=cfg.num_refs).astype(int)

    def _crop(self, image: Image.Image, mask: np.ndarray, K: np.ndarray):
        box = BaseSegmenter.mask_to_box(mask)
        arr, _, crop_params, crop_box = pp.pad_and_resize_image(
            image, self.config.image_size,
            bbox_anno=pp.square_bbox(box) if box is not None else None,
            bbox_obj=box,
        )
        K_crop = pp.adjust_intrinsics_for_crop_resize(
            K, crop_box, self.config.image_size
        )
        return arr, K_crop

    # ------------------------------------------------------------------ run

    def run(self, frames_path: str, output_dir: str) -> Dict:
        import jax.numpy as jnp

        from boxdreamer_tpu.models.predictor import Predictor
        from boxdreamer_tpu.reconstruction.carve import VisualHullReconstructor

        cfg = self.config
        os.makedirs(output_dir, exist_ok=True)
        frame_files = load_frames(frames_path, cfg.frame_stride)
        assert len(frame_files) > cfg.num_refs, "not enough frames"
        frames = [Image.open(f).convert("RGB") for f in frame_files]
        INFO(f"loaded {len(frames)} frames; segmenting with {cfg.segmenter}")
        masks = self.segmenter.segment(frames)

        pose_files = [os.path.splitext(f)[0] + "-pose.txt" for f in frame_files]
        ref_idx = self._select_refs(len(frames), pose_files)
        K_full = default_intrinsics(frames[0].size, cfg.focal_scale)

        # Reference poses: from files, else fail with guidance (DUSt3R gated).
        ref_poses = []
        for i in ref_idx:
            if os.path.exists(pose_files[i]):
                pose = np.loadtxt(pose_files[i])
                if pose.shape == (3, 4):
                    pose = np.vstack([pose, [0, 0, 0, 1]])
                ref_poses.append(pose)
        if len(ref_poses) != len(ref_idx):
            if cfg.reconstruction_backend == "dust3r":
                raise SystemExit(
                    "reference poses missing; run the dust3r reconstruction "
                    "backend offline (boxdreamer_tpu.reconstruction.main)"
                )
            raise SystemExit(
                "reference frames need *-pose.txt files next to the images "
                "(the reference demo writes them after DUSt3R, demo.py:1409)"
            )
        ref_poses = np.stack(ref_poses)

        # Crops + adjusted intrinsics.
        ref_crops, ref_Ks = [], []
        for i in ref_idx:
            arr, K_crop = self._crop(frames[i], masks[i], K_full)
            ref_crops.append(arr)
            ref_Ks.append(K_crop)
        ref_crops = np.stack(ref_crops)
        ref_Ks = np.stack(ref_Ks)

        # Write reference pose/intrinsics files (reference demo.py:1409-1425).
        ref_dir = os.path.join(output_dir, "references")
        os.makedirs(ref_dir, exist_ok=True)
        for j, i in enumerate(ref_idx):
            base = os.path.join(ref_dir, f"{j:04d}")
            Image.fromarray(
                (ref_crops[j].transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(base + "-color.png")
            np.savetxt(base + "-pose.txt", ref_poses[j])
            np.savetxt(base + "-intrinsics.txt", ref_Ks[j])

        # 3D box from reconstruction over the reference crops.
        recon = VisualHullReconstructor()
        recon.set_processed_data(
            {
                "images": ref_crops,
                "non_ndc_intrinsics": ref_Ks,
                "poses": ref_poses,
            }
        )
        result = recon.run(output_ply=os.path.join(ref_dir, "object.ply"))
        bbox_3d = result["bbox_3d"]

        # Reference bbox feature maps.
        S = cfg.image_size
        ref_proj = np.stack(
            [
                pp.project_points(ref_Ks[j], ref_poses[j], bbox_3d)
                for j in range(len(ref_idx))
            ]
        )
        ref_bbox_feat = pp.make_heatmap_features_np(ref_proj, S, S)

        rr = None
        if cfg.use_rerun:
            from boxdreamer_tpu.demo import rerun_log

            rr = rerun_log.init_rerun()

        predictor = Predictor(self.model, self.params)
        predictor.set_references(
            jnp.asarray(ref_crops)[None],
            jnp.asarray(ref_bbox_feat)[None],
            jnp.asarray(bbox_3d)[None],
        )

        # Per-frame tracking.
        fps_meter = FPSMeter(cfg.output_fps_window)
        results = []
        overlays = []
        for idx, (frame, mask) in enumerate(zip(frames, masks)):
            crop, K_crop = self._crop(frame, mask, K_full)
            out = predictor.predict(
                jnp.asarray(crop)[None], jnp.asarray(K_crop)[None]
            )
            pose = np.asarray(out["pred_poses"][0])
            fps = fps_meter.tick()
            overlay = vis.draw_projected_box(crop, K_crop, pose, bbox_3d)
            overlay.save(os.path.join(output_dir, f"overlay_{idx:04d}.png"))
            overlays.append(np.asarray(overlay.convert("RGB")))
            if rr is not None:
                from boxdreamer_tpu.demo import rerun_log

                rerun_log.log_frame(
                    rr, idx, crop.transpose(1, 2, 0),
                    ref_images=[c.transpose(1, 2, 0) for c in ref_crops]
                    if idx == 0 else None,
                    pose=pose, intrinsics=K_crop, bbox_3d=bbox_3d,
                    fps=fps,
                    points=result.get("points") if idx == 0 else None,
                )
            results.append({"pose": pose, "fps": fps})
        valid_fps = [r["fps"] for r in results if r["fps"]]
        INFO(
            f"tracked {len(results)} frames; "
            f"mean FPS {np.mean(valid_fps):.1f}" if valid_fps else "tracked"
        )
        np.save(os.path.join(output_dir, "poses.npy"),
                np.stack([r["pose"] for r in results]))
        if cfg.export_video and overlays:
            from boxdreamer_tpu.utils.video import write_video

            out_avi = os.path.join(output_dir, "tracked.avi")
            write_video(out_avi, overlays, fps=cfg.video_fps)
            INFO(f"wrote overlay video {out_avi}")
            # mp4 export when an ffmpeg binary exists (reference
            # demo.py:1630-1650 writes mp4 directly via cv2.VideoWriter).
            from boxdreamer_tpu.utils.video import (convert_to_mp4,
                                                    ffmpeg_available)

            if ffmpeg_available():
                INFO(f"wrote mp4 {convert_to_mp4(out_avi)}")
        return {"poses": [r["pose"] for r in results], "bbox_3d": bbox_3d}

"""Pluggable object segmentation backends for the demo.

Equivalent of the reference's segmentation layer
(src/demo/seg.py:85-471 VideoSegmentationApp on facebook/sam2-hiera-tiny,
src/demo/ov_det.py:81-646 GroundingDINO text-prompted detection). Backends:

  * ThresholdSegmenter — luminance / background-difference masking; always
    available, good for dark/controlled backgrounds.
  * Sam2Segmenter — HF transformers SAM2 with point/box prompts; gated on
    weight availability.
  * GroundingDinoSegmenter — text-prompted boxes feeding SAM2; gated.

All return per-frame boolean masks; boxes derive from mask bounding rects.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class BaseSegmenter:
    def segment(self, frames: Sequence[Image.Image], **prompts) -> List[np.ndarray]:
        """Return one (H, W) bool mask per frame."""
        raise NotImplementedError

    @staticmethod
    def mask_to_box(mask: np.ndarray) -> Optional[np.ndarray]:
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return None
        return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float64)


class ThresholdSegmenter(BaseSegmenter):
    """Luminance threshold (optionally against a background frame) with a
    largest-connected-component cleanup."""

    def __init__(self, threshold: float = 0.08, background: Optional[Image.Image] = None):
        self.threshold = threshold
        self.background = (
            np.asarray(background.convert("RGB"), np.float32) / 255.0
            if background is not None
            else None
        )

    def _largest_component(self, mask: np.ndarray) -> np.ndarray:
        """Two-pass flood labeling without scipy: BFS from each unvisited
        foreground pixel (masks are small; demo frames ~VGA)."""
        H, W = mask.shape
        labels = np.zeros((H, W), np.int32)
        current = 0
        best_label, best_size = 0, 0
        stack: List[Tuple[int, int]] = []
        for sy, sx in zip(*np.nonzero(mask)):
            if labels[sy, sx]:
                continue
            current += 1
            size = 0
            stack.append((sy, sx))
            labels[sy, sx] = current
            while stack:
                y, x = stack.pop()
                size += 1
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if 0 <= ny < H and 0 <= nx < W and mask[ny, nx] and not labels[ny, nx]:
                        labels[ny, nx] = current
                        stack.append((ny, nx))
            if size > best_size:
                best_label, best_size = current, size
        return labels == best_label if best_label else mask

    def segment(self, frames, **prompts):
        out = []
        for frame in frames:
            arr = np.asarray(frame.convert("RGB"), np.float32) / 255.0
            if self.background is not None and self.background.shape == arr.shape:
                diff = np.abs(arr - self.background).max(axis=-1)
                mask = diff > self.threshold
            else:
                lum = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
                mask = lum > self.threshold
            out.append(self._largest_component(mask))
        return out


class Sam2Segmenter(BaseSegmenter):
    """SAM2 via HF transformers (reference seg.py uses
    facebook/sam2-hiera-tiny). Requires downloadable weights."""

    def __init__(self, model_name: str = "facebook/sam2-hiera-tiny", device: str = "cpu"):
        try:
            import torch  # noqa: F401
            from transformers import Sam2Model, Sam2Processor
        except ImportError as e:  # pragma: no cover
            raise ImportError("transformers with SAM2 support required") from e
        self._Sam2Model = Sam2Model
        self._Sam2Processor = Sam2Processor
        self.model = Sam2Model.from_pretrained(model_name).to(device)
        self.processor = Sam2Processor.from_pretrained(model_name)
        self.device = device

    def segment(self, frames, points=None, boxes=None, **_):  # pragma: no cover
        import torch

        out = []
        for i, frame in enumerate(frames):
            inputs = self.processor(
                images=frame,
                input_points=[points[i]] if points else None,
                input_boxes=[boxes[i]] if boxes else None,
                return_tensors="pt",
            ).to(self.device)
            with torch.no_grad():
                pred = self.model(**inputs)
            masks = self.processor.image_processor.post_process_masks(
                pred.pred_masks.cpu(), inputs["original_sizes"]
            )[0]
            out.append(np.asarray(masks[0, 0] > 0.5))
        return out


class GroundingDinoSegmenter(BaseSegmenter):
    """Text-prompted detection -> box-prompted SAM2 (reference ov_det.py)."""

    def __init__(
        self,
        text_prompt: str,
        detector_name: str = "IDEA-Research/grounding-dino-tiny",
        sam2_name: str = "facebook/sam2-hiera-tiny",
        device: str = "cpu",
        box_threshold: float = 0.35,
    ):
        try:
            from transformers import (  # noqa: F401
                AutoModelForZeroShotObjectDetection,
                AutoProcessor,
            )
        except ImportError as e:  # pragma: no cover
            raise ImportError("transformers required for GroundingDINO") from e
        from transformers import AutoModelForZeroShotObjectDetection, AutoProcessor

        self.text_prompt = text_prompt
        self.box_threshold = box_threshold
        self.device = device
        self.processor = AutoProcessor.from_pretrained(detector_name)
        self.detector = AutoModelForZeroShotObjectDetection.from_pretrained(
            detector_name
        ).to(device)
        self.sam2 = Sam2Segmenter(sam2_name, device)

    def segment(self, frames, **_):  # pragma: no cover
        import torch

        boxes = []
        for frame in frames:
            inputs = self.processor(
                images=frame, text=self.text_prompt, return_tensors="pt"
            ).to(self.device)
            with torch.no_grad():
                pred = self.detector(**inputs)
            res = self.processor.post_process_grounded_object_detection(
                pred,
                inputs["input_ids"],
                threshold=self.box_threshold,
                target_sizes=[frame.size[::-1]],
            )[0]
            box = (
                res["boxes"][0].cpu().numpy()
                if len(res["boxes"])
                else np.array([0, 0, frame.width, frame.height], np.float64)
            )
            boxes.append(box)
        return self.sam2.segment(frames, boxes=boxes)


def build_segmenter(name: str, **kwargs) -> BaseSegmenter:
    if name == "threshold":
        return ThresholdSegmenter(**kwargs)
    if name == "sam2":
        return Sam2Segmenter(**kwargs)
    if name == "groundingdino":
        return GroundingDinoSegmenter(**kwargs)
    raise ValueError(f"unknown segmenter {name}")

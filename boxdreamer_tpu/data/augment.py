"""Training-time augmentation (host side, PIL/numpy).

Equivalent of the reference AugmentationProcessor
(src/datasets/utils/aug.py:24-835) without the albumentations dependency:

  * photometric styles 'dark' / 'mobile' / 'ycb' (brightness/contrast/gamma/
    noise/blur/JPEG-artifact recipes, aug.py:75-142) built from PIL
    ImageEnhance + numpy;
  * FDA stylization (Fourier low-frequency swap with a reference image,
    aug.py:143-171) via numpy FFT;
  * geometric: random in-plane image rotation with consistent pose/K/bbox
    updates (aug.py:470-559), random object-frame pose rotation
    (aug.py:298-347);
  * occlusion: side truncation (aug.py:242-297), random masking inside the
    bbox (aug.py:773-835), background replacement (aug.py:439-470), and
    occluder pasting with IoU-bounded placement (aug.py:560-772).
"""

from __future__ import annotations

import dataclasses
import io
import random
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageDraw, ImageEnhance, ImageFilter


@dataclasses.dataclass
class AugmentationConfig:
    rgb_aug: Optional[str] = None  # 'dark' | 'mobile' | 'ycb' | 'fda' | None
    rgb_aug_prob: float = 0.5
    enable_image_rotation: bool = False
    max_rotation_deg: float = 45.0
    obj_truncation_ratio: Optional[Tuple[float, float]] = None  # e.g. (0.0, 0.5)
    obj_mask_ratio: Optional[Tuple[float, float]] = None
    max_paste_objects: int = 3
    paste_iou_range: Tuple[float, float] = (0.05, 0.4)
    seed: Optional[int] = None


class AugmentationProcessor:
    def __init__(self, config: AugmentationConfig = AugmentationConfig()):
        self.config = config
        self._rng = np.random.default_rng(config.seed)
        self._py_rng = random.Random(config.seed)

    # ----------------------------------------------------------- photometric

    def apply_dark_aug(self, image: Image.Image) -> Image.Image:
        """Low-light recipe: brightness/contrast down, gamma up, noise."""
        img = ImageEnhance.Brightness(image).enhance(self._rng.uniform(0.3, 0.7))
        img = ImageEnhance.Contrast(img).enhance(self._rng.uniform(0.6, 0.9))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        gamma = self._rng.uniform(1.2, 2.0)
        arr = arr**gamma
        noise = self._rng.normal(0.0, self._rng.uniform(0.01, 0.04), arr.shape)
        arr = np.clip(arr + noise, 0, 1)
        return Image.fromarray((arr * 255).astype(np.uint8))

    def apply_mobile_aug(self, image: Image.Image) -> Image.Image:
        """Mobile-camera recipe: JPEG artifacts, slight blur, ISO noise."""
        buf = io.BytesIO()
        image.save(buf, format="JPEG", quality=int(self._rng.integers(30, 70)))
        buf.seek(0)
        img = Image.open(buf).convert("RGB")
        if self._rng.random() < 0.5:
            img = img.filter(ImageFilter.GaussianBlur(self._rng.uniform(0.3, 1.2)))
        arr = np.asarray(img, dtype=np.float32)
        arr += self._rng.normal(0, self._rng.uniform(1, 6), arr.shape)
        return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))

    def apply_ycb_aug(self, image: Image.Image) -> Image.Image:
        """Color-jitter recipe: hue/saturation/brightness/contrast."""
        img = ImageEnhance.Color(image).enhance(self._rng.uniform(0.6, 1.4))
        img = ImageEnhance.Brightness(img).enhance(self._rng.uniform(0.7, 1.3))
        img = ImageEnhance.Contrast(img).enhance(self._rng.uniform(0.7, 1.3))
        if self._rng.random() < 0.3:
            img = img.filter(ImageFilter.GaussianBlur(self._rng.uniform(0.2, 1.0)))
        return img

    def apply_fda(
        self, image: Image.Image, reference: Image.Image, beta: float = 0.01
    ) -> Image.Image:
        """Fourier Domain Adaptation: swap the low-frequency amplitude of the
        image with the reference's (aug.py apply_stylization FDA path)."""
        src = np.asarray(image, dtype=np.float32).transpose(2, 0, 1)
        ref = np.asarray(
            reference.resize(image.size), dtype=np.float32
        ).transpose(2, 0, 1)
        fft_src = np.fft.fft2(src, axes=(-2, -1))
        fft_ref = np.fft.fft2(ref, axes=(-2, -1))
        amp_src, pha_src = np.abs(fft_src), np.angle(fft_src)
        amp_ref = np.abs(fft_ref)
        amp_src = np.fft.fftshift(amp_src, axes=(-2, -1))
        amp_ref = np.fft.fftshift(amp_ref, axes=(-2, -1))
        _, h, w = src.shape
        b = max(1, int(np.floor(min(h, w) * beta)))
        cy, cx = h // 2, w // 2
        amp_src[:, cy - b : cy + b, cx - b : cx + b] = amp_ref[
            :, cy - b : cy + b, cx - b : cx + b
        ]
        amp_src = np.fft.ifftshift(amp_src, axes=(-2, -1))
        out = np.fft.ifft2(amp_src * np.exp(1j * pha_src), axes=(-2, -1)).real
        out = np.clip(out, 0, 255).astype(np.uint8).transpose(1, 2, 0)
        return Image.fromarray(out)

    def apply_rgb_augmentation(
        self, image: Image.Image, reference: Optional[Image.Image] = None
    ) -> Image.Image:
        cfg = self.config
        if cfg.rgb_aug is None or self._rng.random() > cfg.rgb_aug_prob:
            return image
        if cfg.rgb_aug == "dark":
            return self.apply_dark_aug(image)
        if cfg.rgb_aug == "mobile":
            return self.apply_mobile_aug(image)
        if cfg.rgb_aug == "ycb":
            return self.apply_ycb_aug(image)
        if cfg.rgb_aug == "fda" and reference is not None:
            return self.apply_fda(image, reference)
        return image

    # ------------------------------------------------------------- geometric

    def pose_augmentation_R(self, poses: np.ndarray) -> np.ndarray:
        """Right-multiply all poses by one random rotation — rotates the
        object (and its box) in its own frame (aug.py:298-347).

        Args:
            poses: (T, 4, 4) world->camera.
        """
        rx, ry, rz = self._rng.uniform(-np.pi, np.pi, 3)
        cx_, sx = np.cos(rx), np.sin(rx)
        cy_, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        Rx = np.array([[1, 0, 0], [0, cx_, -sx], [0, sx, cx_]])
        Ry = np.array([[cy_, 0, sy], [0, 1, 0], [-sy, 0, cy_]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = Rx @ Ry @ Rz
        out = poses.copy()
        out[:, :3, :3] = poses[:, :3, :3] @ R
        return out

    def rotate_image(
        self,
        image: Image.Image,
        pose: np.ndarray,
        bbox: Optional[np.ndarray],
        K: np.ndarray,
    ):
        """Random in-plane rotation about the principal point, with pose, K,
        and bbox kept consistent (aug.py:470-559).

        Returns (image, pose, bbox, K)."""
        if not self.config.enable_image_rotation:
            return image, pose, bbox, K
        angle = float(self._rng.uniform(-self.config.max_rotation_deg,
                                        self.config.max_rotation_deg))
        theta = np.radians(angle)
        w, h = image.size
        cx, cy = K[0, 2], K[1, 2]
        rotated = image.rotate(angle, expand=True, center=(cx, cy))
        new_w, new_h = rotated.size

        Rz = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        c2w = np.linalg.inv(pose)
        c2w[:3, :3] = c2w[:3, :3] @ Rz
        new_pose = np.linalg.inv(c2w)

        new_K = K.copy()
        new_K[0, 2] = cx + (new_w - w) / 2
        new_K[1, 2] = cy + (new_h - h) / 2

        new_bbox = None
        if bbox is not None:
            mask = Image.new("L", image.size, 0)
            ImageDraw.Draw(mask).rectangle([int(v) for v in bbox], fill=255)
            rot_mask = mask.rotate(angle, expand=True, center=(cx, cy))
            bb = rot_mask.getbbox()
            new_bbox = np.asarray(bb, dtype=np.float64) if bb else None
        return rotated, new_pose, new_bbox, new_K

    # -------------------------------------------------------------- occlusion

    def random_truncate_image_with_bbox(
        self, image: Image.Image, bbox: Optional[np.ndarray] = None,
        mask_ratio=None,
    ) -> Image.Image:
        """Black out one side of the bbox region (aug.py:242-297)."""
        if mask_ratio is None:
            mask_ratio = self.config.obj_truncation_ratio
        if mask_ratio is None:
            return image
        w, h = image.size
        x0, y0, x1, y1 = (0, 0, w, h) if bbox is None else bbox
        if isinstance(mask_ratio, (tuple, list)):
            mask_ratio = self._rng.uniform(*mask_ratio)
        side = self._py_rng.choice(["left", "top", "right", "bottom"])
        if side == "right":
            x1 = int(x0 + (x1 - x0) * (1 - mask_ratio))
        elif side == "bottom":
            y1 = int(y0 + (y1 - y0) * (1 - mask_ratio))
        elif side == "left":
            x0 = int(x1 - (x1 - x0) * (1 - mask_ratio))
        else:
            y0 = int(y1 - (y1 - y0) * (1 - mask_ratio))
        mask = Image.new("L", image.size, 0)
        ImageDraw.Draw(mask).rectangle([x0, y0, x1, y1], fill=255)
        return Image.composite(image, Image.new("RGB", image.size, (0, 0, 0)), mask)

    def random_mask_image_with_bbox(
        self,
        image: Image.Image,
        fill_image: Optional[Image.Image] = None,
        bbox: Optional[np.ndarray] = None,
    ) -> Image.Image:
        """Drop random rectangles inside the bbox, filled with black or with
        patches of ``fill_image`` (aug.py:773-835)."""
        if self.config.obj_mask_ratio is None:
            return image
        w, h = image.size
        x0, y0, x1, y1 = (0, 0, w, h) if bbox is None else [int(v) for v in bbox]
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, w), min(y1, h)
        if x1 <= x0 + 2 or y1 <= y0 + 2:
            return image
        out = image.copy()
        n = int(self._rng.integers(1, 4))
        for _ in range(n):
            ratio = self._rng.uniform(*self.config.obj_mask_ratio)
            mw = max(2, int((x1 - x0) * ratio))
            mh = max(2, int((y1 - y0) * ratio))
            mx = int(self._rng.integers(x0, max(x1 - mw, x0 + 1)))
            my = int(self._rng.integers(y0, max(y1 - mh, y0 + 1)))
            if fill_image is not None:
                patch = fill_image.resize((mw, mh))
                out.paste(patch, (mx, my))
            else:
                ImageDraw.Draw(out).rectangle(
                    [mx, my, mx + mw, my + mh], fill=(0, 0, 0)
                )
        return out

    def add_background(
        self, image: Image.Image, bg_image: Image.Image, threshold: int = 10
    ) -> Image.Image:
        """Replace (near-)black background pixels with a background image
        (aug.py:439-470; synthetic renders have black backgrounds)."""
        bg = bg_image.resize(image.size)
        arr = np.asarray(image)
        mask = (arr.max(axis=-1) > threshold).astype(np.uint8) * 255
        return Image.composite(image, bg, Image.fromarray(mask))

    @staticmethod
    def compute_iou(box1, box2) -> float:
        ix0 = max(box1[0], box2[0])
        iy0 = max(box1[1], box2[1])
        ix1 = min(box1[2], box2[2])
        iy1 = min(box1[3], box2[3])
        inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
        a1 = (box1[2] - box1[0]) * (box1[3] - box1[1])
        a2 = (box2[2] - box2[0]) * (box2[3] - box2[1])
        return inter / max(a1 + a2 - inter, 1e-9)

    def random_paste_objs(
        self,
        image: Image.Image,
        occluders: Sequence[Image.Image],
        bbox: Optional[np.ndarray] = None,
    ) -> Image.Image:
        """Paste occluder cut-outs so they partially overlap the object box
        with IoU in the configured range (aug.py:560-772)."""
        if not occluders or bbox is None:
            return image
        out = image.copy()
        w, h = image.size
        n = int(self._rng.integers(1, self.config.max_paste_objects + 1))
        lo, hi = self.config.paste_iou_range
        for _ in range(n):
            occ = self._py_rng.choice(list(occluders))
            scale = self._rng.uniform(0.2, 0.6)
            ow = max(4, int((bbox[2] - bbox[0]) * scale))
            oh = max(4, int((bbox[3] - bbox[1]) * scale))
            occ = occ.resize((ow, oh))
            for _try in range(10):
                px = int(self._rng.integers(0, max(w - ow, 1)))
                py = int(self._rng.integers(0, max(h - oh, 1)))
                iou = self.compute_iou(bbox, (px, py, px + ow, py + oh))
                if lo <= iou <= hi:
                    if occ.mode == "RGBA":
                        out.paste(occ, (px, py), occ)
                    else:
                        out.paste(occ, (px, py))
                    break
        return out

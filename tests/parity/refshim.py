"""Load REAL reference modules from /root/reference under torch-CPU.

The round-1 parity tests compared against hand-rebuilt torch mini-modules; a
shared misreading of the reference would pass them. This loader executes the
actual reference source (betr.py, blocks.py, box_utils.py, preprocess.py,
camera_transform.py, bbox_utils.py) so golden tests exercise the real code.

Strategy:
  * every reference *package* ``__init__`` is replaced by an empty namespace
    module whose ``__path__`` points at the real directory (the inits either
    are empty or import heavyweight dead subsystems); leaf *modules* are then
    imported normally and execute the real reference code;
  * absent third-party deps are shimmed in sys.modules with faithful,
    documented-semantics implementations:
      - timm: ``Mlp`` / ``DropPath`` (~25 LoC, the only two symbols used,
        reference blocks.py:28-29)
      - torchvision: ``transforms.{Compose,ToTensor,Resize}`` +
        ``functional.crop`` for PIL inputs (preprocess.py:154-155,258) —
        Resize implements the PIL/torchvision antialiased triangle filter
      - pytorch3d: row-vector ``Transform3d``/``Rotate``/``Translate``,
        minimal ``PerspectiveCameras``, and the documented
        opencv<->pytorch3d conversion formulas (camera_transform.py:15-18)
      - loguru / torchmetrics / omegaconf: inert stubs

NOTE: nothing here is copied into the framework; this module exists only so
tests can run /root/reference code against boxdreamer_tpu outputs.
"""

from __future__ import annotations

import copy
import importlib
import math
import os
import sys
import types

import numpy as np
import torch
from torch import nn

REF = "/root/reference"

_REF_PACKAGES = [
    "src",
    "src.models",
    "src.models.modules",
    "src.models.modules.backbone",
    "src.models.modules.backbone.utils",
    "src.models.modules.encoder",
    "src.models.modules.tracker",
    "src.models.sources",
    "src.models.sources.vggsfm",
    "src.models.sources.vggsfm.models",
    "src.models.sources.vggsfm.utils",
    "src.models.utils",
    "src.datasets",
    "src.datasets.utils",
    "src.datasets.utils.base",
    "src.utils",
    "src.utils.customize",
    "src.lightning",
    "src.lightning.utils",
    "src.lightning.utils.metrics",
    "src.lightning.utils.vis",
    "src.loss",
    "src.loss.utils",
]


# ---------------------------------------------------------------------------
# timm shim: exactly the two symbols blocks.py imports.
# ---------------------------------------------------------------------------


class _TimmMlp(nn.Module):
    """timm.models.vision_transformer.Mlp with the fields blocks.py uses
    (fc1 -> act -> drop1 -> norm -> fc2 -> drop2; norm defaults Identity)."""

    def __init__(
        self,
        in_features,
        hidden_features=None,
        out_features=None,
        act_layer=nn.GELU,
        norm_layer=None,
        bias=True,
        drop=0.0,
        **_,
    ):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
        self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))


class _DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = float(drop_prob)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def _install_timm():
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    layers = types.ModuleType("timm.layers")
    vt.Mlp = _TimmMlp
    layers.DropPath = _DropPath
    layers.Mlp = _TimmMlp
    timm.models = models
    models.vision_transformer = vt
    timm.layers = layers
    sys.modules.update(
        {
            "timm": timm,
            "timm.models": models,
            "timm.models.vision_transformer": vt,
            "timm.layers": layers,
        }
    )


# ---------------------------------------------------------------------------
# torchvision shim: Compose/ToTensor/Resize + functional.crop on PIL images.
# ---------------------------------------------------------------------------


def _triangle_resize_1d(arr: np.ndarray, out_size: int, axis: int) -> np.ndarray:
    """PIL/torchvision antialiased bilinear resampling along one axis
    (triangle filter, support scaled by the downsampling factor)."""
    in_size = arr.shape[axis]
    if in_size == out_size:
        return arr
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale
    arr = np.moveaxis(arr, axis, 0).astype(np.float64)
    out = np.empty((out_size,) + arr.shape[1:], dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), in_size)
        xs = np.arange(lo, hi, dtype=np.float64)
        w = 1.0 - np.abs((xs - center + 0.5) / filterscale)
        w = np.clip(w, 0.0, None)
        w = w / w.sum()
        out[i] = np.tensordot(w, arr[lo:hi], axes=(0, 0))
    return np.moveaxis(out, 0, axis)


class _Resize:
    def __init__(self, size, antialias=True, **_):
        self.size = size

    def __call__(self, t: torch.Tensor) -> torch.Tensor:
        c, h, w = t.shape
        if isinstance(self.size, int):
            if h <= w:
                nh, nw = self.size, max(int(round(w * self.size / h)), 1)
            else:
                nh, nw = max(int(round(h * self.size / w)), 1), self.size
        else:
            nh, nw = self.size
        a = t.numpy()
        a = _triangle_resize_1d(a, nh, axis=1)
        a = _triangle_resize_1d(a, nw, axis=2)
        return torch.from_numpy(a).to(t.dtype)


class _ToTensor:
    def __call__(self, img):
        a = np.asarray(img)
        if a.ndim == 2:
            a = a[:, :, None]
        a = a.astype(np.float32) / 255.0
        return torch.from_numpy(a).permute(2, 0, 1).contiguous()


class _Compose:
    def __init__(self, ts):
        self.ts = ts

    def __call__(self, x):
        for t in self.ts:
            x = t(x)
        return x


def _tv_crop(img, top: int, left: int, height: int, width: int):
    """torchvision.transforms.functional.crop on a PIL image: PIL's crop
    zero-pads regions outside the source."""
    return img.crop((left, top, left + width, top + height))


def _install_torchvision():
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    transforms.Compose = _Compose
    transforms.ToTensor = _ToTensor
    transforms.Resize = _Resize
    transforms.functional = functional
    functional.crop = _tv_crop
    tv.transforms = transforms

    # torchvision.models: only reachable when a config enables the VGG16
    # perceptual loss — construction must fail loudly, import must succeed
    # (src/loss/loss.py imports PerceptualLoss unconditionally).
    models = types.ModuleType("torchvision.models")

    def _no_weights(*a, **k):
        raise RuntimeError(
            "torchvision stub: pretrained VGG16 not available in tests"
        )

    models.vgg16 = _no_weights
    models.VGG16_Weights = types.SimpleNamespace(IMAGENET1K_V1=None, DEFAULT=None)
    tv.models = models
    sys.modules.update(
        {
            "torchvision": tv,
            "torchvision.transforms": transforms,
            "torchvision.transforms.functional": functional,
            "torchvision.models": models,
        }
    )


# ---------------------------------------------------------------------------
# pytorch3d shim: row-vector transforms + opencv conversion formulas.
# ---------------------------------------------------------------------------


class _Transform3d:
    """PyTorch3D row-vector convention: p' = [p, 1] @ M, M is (N, 4, 4);
    compose(a, b) applies self, then a, then b (M = M_self @ M_a @ M_b)."""

    def __init__(self, matrix: torch.Tensor):
        if matrix.ndim == 2:
            matrix = matrix[None]
        self._matrix = matrix

    def get_matrix(self) -> torch.Tensor:
        return self._matrix

    def compose(self, *others: "_Transform3d") -> "_Transform3d":
        m = self._matrix
        for o in others:
            a, b = torch.broadcast_tensors(
                m, o._matrix.expand(max(len(m), len(o._matrix)), 4, 4)
            )
            m = torch.bmm(a, b)
        return _Transform3d(m)

    def inverse(self) -> "_Transform3d":
        return _Transform3d(torch.inverse(self._matrix))

    def transform_points(self, points: torch.Tensor) -> torch.Tensor:
        squeeze = points.ndim == 2
        if squeeze:
            points = points[None]
        ones = torch.ones(points.shape[:-1] + (1,), dtype=points.dtype)
        ph = torch.cat([points, ones], dim=-1)
        m = self._matrix
        if len(m) == 1 and len(ph) > 1:
            m = m.expand(len(ph), 4, 4)
        out = torch.bmm(ph, m)
        out = out[..., :3] / out[..., 3:4]
        return out[0] if squeeze else out


class _Rotate(_Transform3d):
    def __init__(self, R: torch.Tensor):
        if R.ndim == 2:
            R = R[None]
        n = len(R)
        m = torch.eye(4, dtype=R.dtype).repeat(n, 1, 1)
        m[:, :3, :3] = R
        super().__init__(m)


class _Translate(_Transform3d):
    def __init__(self, t: torch.Tensor):
        if t.ndim == 1:
            t = t[None]
        n = len(t)
        m = torch.eye(4, dtype=t.dtype).repeat(n, 1, 1)
        m[:, 3, :3] = t
        super().__init__(m)


class _PerspectiveCameras:
    def __init__(
        self,
        focal_length=None,
        principal_point=None,
        R=None,
        T=None,
        image_size=None,
        **_,
    ):
        if focal_length is not None and not torch.is_tensor(focal_length):
            # pytorch3d accepts a sequence of scalars: (N,) -> (N, 2)
            fl = torch.as_tensor(focal_length, dtype=torch.float32)
            if fl.ndim == 1:
                fl = fl[:, None].expand(-1, 2)
            focal_length = fl
        if principal_point is None and focal_length is not None:
            principal_point = torch.zeros_like(focal_length[:, :2])
        # N is inferred from any batched argument (pytorch3d broadcasts
        # unspecified R/T to the common batch size).
        n = max(
            (len(v) for v in (R, T, focal_length, principal_point) if v is not None),
            default=1,
        )
        self.R = (
            R if R is not None else torch.eye(3)[None].expand(n, -1, -1).clone()
        )
        self.T = T if T is not None else torch.zeros(n, 3)
        self.focal_length = focal_length
        self.principal_point = principal_point
        self.image_size = image_size

    def __len__(self):
        return len(self.R)

    @property
    def device(self):
        return self.R.device

    def __getitem__(self, i):
        """Single-camera view (rays.py:274-292 iterates cameras). Uses the
        old-style sequence protocol: IndexError terminates iteration."""
        if not isinstance(i, int):
            raise TypeError(i)
        if i < 0 or i >= len(self):
            raise IndexError(i)
        out = _PerspectiveCameras(
            R=self.R[i : i + 1],
            T=self.T[i : i + 1],
            focal_length=None
            if self.focal_length is None
            else self.focal_length[i : i + 1],
            principal_point=None
            if self.principal_point is None
            else self.principal_point[i : i + 1],
            image_size=None
            if self.image_size is None
            else self.image_size[i : i + 1],
        )
        out._scalar = True
        return out

    def clone(self):
        out = _PerspectiveCameras()
        for k in ("R", "T", "focal_length", "principal_point", "image_size"):
            v = getattr(self, k)
            setattr(out, k, v.clone() if torch.is_tensor(v) else copy.copy(v))
        return out

    def get_world_to_view_transform(self) -> _Transform3d:
        return _Rotate(self.R).compose(_Translate(self.T))

    def get_camera_center(self) -> torch.Tensor:
        w2v = self.get_world_to_view_transform().get_matrix()
        inv = torch.inverse(w2v)
        return inv[:, 3, :3]

    def unproject_points(
        self, xy_depth: torch.Tensor, from_ndc=True, world_coordinates=True
    ) -> torch.Tensor:
        """Unproject NDC (x, y, depth) to world. PyTorch3D perspective
        projection (row vector): x_ndc = fx * X/Z + px, y_ndc = fy * Y/Z + py,
        with (X, Y, Z) in view space."""
        assert from_ndc
        fx = self.focal_length[:, 0][:, None]
        fy = self.focal_length[:, 1][:, None]
        px = self.principal_point[:, 0][:, None]
        py = self.principal_point[:, 1][:, None]
        # xy_depth: (P, 3) interpreted per-camera -> (N, P, 3)
        if xy_depth.ndim == 2:
            xy_depth = xy_depth[None].expand(len(self), -1, -1)
        z = xy_depth[..., 2]
        x = (xy_depth[..., 0] - px) / fx * z
        y = (xy_depth[..., 1] - py) / fy * z
        view = torch.stack([x, y, z], dim=-1)
        out = (
            view
            if not world_coordinates
            else self.get_world_to_view_transform().inverse().transform_points(view)
        )
        # A camera obtained via __getitem__ is scalar: (P, 3) in, (P, 3) out
        # (pytorch3d broadcast semantics, used by rays.py:288-291).
        if getattr(self, "_scalar", False) and out.shape[0] == 1:
            return out[0]
        return out


def _cameras_from_opencv_projection(R, tvec, camera_matrix, image_size):
    focal_length = torch.stack(
        [camera_matrix[:, 0, 0], camera_matrix[:, 1, 1]], dim=-1
    )
    principal_point = camera_matrix[:, :2, 2]
    image_size_wh = image_size.to(R).flip(dims=(1,))
    scale = image_size_wh.min(dim=1, keepdim=True)[0] / 2.0
    scale = scale.expand(-1, 2)
    c0 = image_size_wh / 2.0
    p0_pytorch3d = -(principal_point - c0) / scale
    focal_pytorch3d = focal_length / scale
    R_pytorch3d = R.clone().permute(0, 2, 1)
    T_pytorch3d = tvec.clone()
    R_pytorch3d[:, :, :2] *= -1
    T_pytorch3d[:, :2] *= -1
    return _PerspectiveCameras(
        R=R_pytorch3d,
        T=T_pytorch3d,
        focal_length=focal_pytorch3d,
        principal_point=p0_pytorch3d,
        image_size=image_size,
    )


def _opencv_from_cameras_projection(cameras, image_size):
    R_pytorch3d = cameras.R.clone()
    T_pytorch3d = cameras.T.clone()
    focal_pytorch3d = cameras.focal_length
    p0_pytorch3d = cameras.principal_point
    T_pytorch3d[:, :2] *= -1
    R_pytorch3d[:, :, :2] *= -1
    tvec = T_pytorch3d
    R = R_pytorch3d.permute(0, 2, 1)
    image_size_wh = image_size.to(R).flip(dims=(1,))
    scale = image_size_wh.min(dim=1, keepdim=True)[0] / 2.0
    scale = scale.expand(-1, 2)
    c0 = image_size_wh / 2.0
    principal_point = -p0_pytorch3d * scale + c0
    focal_length = focal_pytorch3d * scale
    camera_matrix = torch.zeros(len(R), 3, 3, dtype=R.dtype)
    camera_matrix[:, 0, 0] = focal_length[:, 0]
    camera_matrix[:, 1, 1] = focal_length[:, 1]
    camera_matrix[:, :2, 2] = principal_point
    camera_matrix[:, 2, 2] = 1.0
    return R, tvec, camera_matrix


def _quaternion_to_matrix(quaternions: torch.Tensor) -> torch.Tensor:
    r, i, j, k = torch.unbind(quaternions, -1)
    two_s = 2.0 / (quaternions * quaternions).sum(-1)
    o = torch.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        -1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _matrix_to_quaternion(matrix: torch.Tensor) -> torch.Tensor:
    m00, m01, m02 = matrix[..., 0, 0], matrix[..., 0, 1], matrix[..., 0, 2]
    m10, m11, m12 = matrix[..., 1, 0], matrix[..., 1, 1], matrix[..., 1, 2]
    m20, m21, m22 = matrix[..., 2, 0], matrix[..., 2, 1], matrix[..., 2, 2]
    q_abs = torch.sqrt(
        torch.clamp(
            torch.stack(
                [
                    1.0 + m00 + m11 + m22,
                    1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22,
                    1.0 - m00 - m11 + m22,
                ],
                dim=-1,
            ),
            min=0.0,
        )
    )
    quat_by_rijk = torch.stack(
        [
            torch.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            torch.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            torch.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            torch.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        dim=-2,
    )
    flr = torch.tensor(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * q_abs[..., None].max(flr))
    idx = q_abs.argmax(dim=-1)
    return quat_candidates.take_along_dim(
        idx[..., None, None].expand(idx.shape + (1, 4)), dim=-2
    ).squeeze(-2)


def _install_pytorch3d():
    p3d = types.ModuleType("pytorch3d")
    renderer = types.ModuleType("pytorch3d.renderer")
    cameras = types.ModuleType("pytorch3d.renderer.cameras")
    transforms_m = types.ModuleType("pytorch3d.transforms")
    rot_conv = types.ModuleType("pytorch3d.transforms.rotation_conversions")
    utils_m = types.ModuleType("pytorch3d.utils")
    cam_conv = types.ModuleType("pytorch3d.utils.camera_conversions")

    implicit = types.ModuleType("pytorch3d.renderer.implicit")

    class _HarmonicEmbedding(nn.Module):
        """pytorch3d HarmonicEmbedding (used by the reference's unused
        RoPE/NeRF helpers; faithful enough for import)."""

        def __init__(
            self, n_harmonic_functions=6, omega_0=1.0, logspace=True, append_input=True
        ):
            super().__init__()
            if logspace:
                freq = 2.0 ** torch.arange(n_harmonic_functions, dtype=torch.float32)
            else:
                freq = torch.linspace(
                    1.0, 2.0 ** (n_harmonic_functions - 1), n_harmonic_functions
                )
            self.register_buffer("_frequencies", freq * omega_0, persistent=False)
            self.append_input = append_input

        def forward(self, x: torch.Tensor):
            embed = (x[..., None] * self._frequencies).reshape(*x.shape[:-1], -1)
            out = [embed.sin(), embed.cos()]
            if self.append_input:
                out.append(x)
            return torch.cat(out, dim=-1)

    implicit.HarmonicEmbedding = _HarmonicEmbedding
    renderer.implicit = implicit
    sys.modules["pytorch3d.renderer.implicit"] = implicit

    # vis_utils.py:21-25 imports these from pytorch3d.renderer /
    # pytorch3d.vis.plotly_vis (plotting-only paths; plot_scene fails on use).
    renderer.PerspectiveCameras = _PerspectiveCameras

    class _RayBundle:
        def __init__(self, origins=None, directions=None, lengths=None, xys=None):
            self.origins, self.directions = origins, directions
            self.lengths, self.xys = lengths, xys

    renderer.RayBundle = _RayBundle
    vis_pkg = types.ModuleType("pytorch3d.vis")
    plotly_vis = types.ModuleType("pytorch3d.vis.plotly_vis")

    def _no_plot_scene(*a, **k):
        raise RuntimeError("pytorch3d stub: plot_scene not available in tests")

    plotly_vis.plot_scene = _no_plot_scene
    vis_pkg.plotly_vis = plotly_vis
    sys.modules["pytorch3d.vis"] = vis_pkg
    sys.modules["pytorch3d.vis.plotly_vis"] = plotly_vis

    cameras.PerspectiveCameras = _PerspectiveCameras
    cameras.CamerasBase = _PerspectiveCameras
    transforms_m.Rotate = _Rotate
    transforms_m.Translate = _Translate
    transforms_m.Transform3d = _Transform3d
    transforms_m.rotation_conversions = rot_conv
    transforms_m.matrix_to_quaternion = _matrix_to_quaternion
    transforms_m.quaternion_to_matrix = _quaternion_to_matrix
    rot_conv.matrix_to_quaternion = _matrix_to_quaternion
    rot_conv.quaternion_to_matrix = _quaternion_to_matrix
    cam_conv.cameras_from_opencv_projection = _cameras_from_opencv_projection
    cam_conv.opencv_from_cameras_projection = _opencv_from_cameras_projection

    p3d.renderer = renderer
    p3d.vis = vis_pkg
    renderer.cameras = cameras
    p3d.transforms = transforms_m
    p3d.utils = utils_m
    utils_m.camera_conversions = cam_conv
    sys.modules.update(
        {
            "pytorch3d": p3d,
            "pytorch3d.renderer": renderer,
            "pytorch3d.renderer.cameras": cameras,
            "pytorch3d.transforms": transforms_m,
            "pytorch3d.transforms.rotation_conversions": rot_conv,
            "pytorch3d.utils": utils_m,
            "pytorch3d.utils.camera_conversions": cam_conv,
        }
    )


# ---------------------------------------------------------------------------
# inert stubs
# ---------------------------------------------------------------------------


def _install_misc():
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, name):
                return lambda *a, **k: None

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm_image = types.ModuleType("torchmetrics.image")

        class _PSNR:
            def __init__(self, *a, **k):
                pass

        tm_image.PeakSignalNoiseRatio = _PSNR
        tm.image = tm_image
        sys.modules.update({"torchmetrics": tm, "torchmetrics.image": tm_image})

    if "open3d" not in sys.modules:
        o3d = types.ModuleType("open3d")

        def _fail(*a, **k):
            raise RuntimeError("open3d stub: not available in tests")

        o3d.io = types.SimpleNamespace(read_triangle_mesh=_fail)
        o3d.geometry = types.SimpleNamespace()
        sys.modules["open3d"] = o3d

    if "plyfile" not in sys.modules:
        plyfile = types.ModuleType("plyfile")

        class _PlyElement:
            def __init__(self, data):
                self.data = data

        class _PlyData:
            """Minimal ascii-PLY vertex reader with the
            ``PlyData.read(path).elements[0].data['x']`` access pattern that
            sample_points_on_cad.py:149-160 uses (fixtures are ascii)."""

            def __init__(self, elements):
                self.elements = elements

            @staticmethod
            def read(path):
                with open(path, "rb") as f:
                    header = []
                    while True:
                        line = f.readline().decode("ascii").strip()
                        header.append(line)
                        if line == "end_header":
                            break
                    if not any(
                        h.startswith("format ascii") for h in header
                    ):
                        raise RuntimeError(
                            "plyfile stub: only ascii PLY supported in tests"
                        )
                    n_vertex = next(
                        int(h.split()[-1])
                        for h in header
                        if h.startswith("element vertex")
                    )
                    props = [
                        h.split()[-1]
                        for h in header
                        if h.startswith("property") and "list" not in h
                    ]
                    rows = [
                        f.readline().decode("ascii").split()
                        for _ in range(n_vertex)
                    ]
                data = np.array(
                    [[float(v) for v in row[: len(props)]] for row in rows]
                )
                rec = np.core.records.fromarrays(
                    data.T, names=",".join(props)
                )
                return _PlyData([_PlyElement(rec)])

        plyfile.PlyData = _PlyData
        plyfile.PlyElement = _PlyElement
        sys.modules["plyfile"] = plyfile

    if "trimesh" not in sys.modules:
        trimesh = types.ModuleType("trimesh")

        def _fail_tm(*a, **k):
            raise RuntimeError("trimesh stub: not available in tests")

        trimesh.load = _fail_tm
        trimesh.Scene = type("Scene", (), {})
        trimesh.Trimesh = type("Trimesh", (), {})
        trimesh.util = types.SimpleNamespace(concatenate=_fail_tm)
        sys.modules["trimesh"] = trimesh

    # Plot/IO-only deps of vis_utils.py (imported at module scope by the
    # dataset chain via prepare_bbox3d -> get_3d_bbox_from_pts); none of
    # their functionality is exercised by golden tests — attribute access
    # succeeds, use fails loudly.
    def _inert_module(name, **attrs):
        if name in sys.modules:
            return

        class _Fail:
            def __init__(self, *a, **k):
                raise RuntimeError(f"{name} stub: not available in tests")

            def __call__(self, *a, **k):
                raise RuntimeError(f"{name} stub: not available in tests")

        def _getattr(attr, _n=name):
            # Dunders must raise (inspect & friends probe __file__ etc. on
            # every sys.modules entry); anything else yields a fail-on-use
            # placeholder class.
            if attr.startswith("__") and attr.endswith("__"):
                raise AttributeError(attr)
            return _Fail

        mod = types.ModuleType(name)
        mod.__getattr__ = _getattr
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    _inert_module("imageio")
    if "imageio.v3" not in sys.modules:
        v3 = _inert_module("imageio.v3")
        if "imageio" in sys.modules:
            sys.modules["imageio"].v3 = sys.modules["imageio.v3"]
    _inert_module("lmdb")
    # kornia: BoxDreamerModel.py:11 imports LoFTR at module scope; the
    # matcher is only constructed when use_matching=True.
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        kfeat = types.ModuleType("kornia.feature")

        class _LoFTR:
            def __init__(self, *a, **k):
                raise RuntimeError("kornia stub: LoFTR not available in tests")

        kfeat.LoFTR = _LoFTR
        kornia.feature = kfeat
        sys.modules.update({"kornia": kornia, "kornia.feature": kfeat})
    _inert_module("natsort", natsorted=sorted)
    _inert_module("wis3d")
    _inert_module("wandb")
    _inert_module("albumentations")
    go = types.ModuleType("plotly.graph_objs")
    go.Figure = type("Figure", (), {})
    go.Scatter3d = type("Scatter3d", (), {})
    plotly_mod = _inert_module("plotly", graph_objs=go)
    if plotly_mod is not None:
        sys.modules["plotly.graph_objs"] = go

    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def create(x=None):
                return DictConfig(x or {})

        oc.DictConfig = DictConfig
        oc.OmegaConf = OmegaConf
        oc.ListConfig = list
        sys.modules["omegaconf"] = oc


_installed = False

# Top-level names we stub: their sys.modules entries need a (loader-less)
# ModuleSpec, because transformers' lazy import machinery probes
# availability via module.__spec__ and raises on None (import_utils.py) —
# without this, importing HF models AFTER refshim.install() breaks.
_STUBBED_TOPLEVEL = {
    "timm", "torchvision", "pytorch3d", "loguru", "torchmetrics", "open3d",
    "plyfile", "trimesh", "omegaconf", "imageio", "natsort", "wis3d",
    "wandb", "albumentations", "plotly", "lmdb", "kornia",
}


def install() -> None:
    global _installed
    if _installed:
        return
    _install_timm()
    _install_torchvision()
    _install_pytorch3d()
    _install_misc()
    for pkg in _REF_PACKAGES:
        if pkg in sys.modules:
            continue
        mod = types.ModuleType(pkg)
        mod.__path__ = [os.path.join(REF, pkg.replace(".", "/"))]
        mod.__package__ = pkg
        mod.__ref_shim__ = True
        sys.modules[pkg] = mod
    import importlib.machinery

    for name, mod in list(sys.modules.items()):
        top = name.split(".")[0]
        if (
            isinstance(mod, types.ModuleType)
            and getattr(mod, "__spec__", None) is None
            and (top in _STUBBED_TOPLEVEL or getattr(mod, "__ref_shim__", False))
        ):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    _installed = True


def load(name: str):
    """Import a REAL reference leaf module (e.g.
    'src.models.modules.backbone.betr') with package inits faked."""
    install()
    return importlib.import_module(name)

"""Pure-JAX geometry / vision ops shared across the framework.

Everything in this package is functional, shape-static, and jit/vmap-friendly:
no Python data-dependent control flow, no host round-trips. These ops replace
the reference implementation's mix of numpy, PyTorch3D (C++/CUDA) and OpenCV
(C++ on CPU) with on-device XLA programs.
"""

from boxdreamer_tpu.ops import camera, heatmap, decode, pnp, rotation, normalize

__all__ = ["camera", "heatmap", "decode", "pnp", "rotation", "normalize"]

"""BoxDreamer-TPU: a TPU-native (JAX/XLA/Pallas) 6-DoF object pose estimation framework.

Re-designed from scratch with the capabilities of zju3dv/BoxDreamer (ICCV 2025):
given N posed reference crops of a novel object and one query crop, a ViT-style
transformer (BETR) regresses heatmaps of the 8 projected 3D-bounding-box corners
in the query; keypoints are decoded and an on-device batched PnP solve recovers
the query camera pose.

Unlike the reference (PyTorch + CUDA + per-sample OpenCV solvePnP on CPU), the
entire inference path here — preprocessing math, ViT encoder, BETR decoder,
keypoint decode, and batched EPnP/Gauss-Newton pose solve — is one jittable XLA
program that runs fully on TPU, and shards over a `jax.sharding.Mesh` for
multi-chip execution.
"""

__version__ = "0.1.0"

"""Golden ray-representation parity: execute the REAL reference
rays/camera_processing code (src/models/utils/rays.py:254-366,
camera_processing.py:8-116) under torch-CPU and compare our closed-form
JAX rays (ops/rays.py, models/camera_repr.py).

Also pins down two latent reference quirks our implementation documents:
  * camera_processing.py:84 passes ``cameras`` positionally into
    rays_to_cameras' ``use_half_pix`` slot, so the reference recovers
    poses with the DEFAULT focal length (3.453) ray pattern, not the real
    intrinsics; we call with the real intrinsics (the intended math —
    verified equivalent below via the correctly-invoked reference path).
  * camera_processing.py:50-54 passes ``num_patches`` positionally into
    ``use_half_pix``/``use_plucker``, so the ray grid is ALWAYS the
    default 16x16; with the flagship 224/14 geometry that coincides.
"""

import numpy as np
import pytest
import torch

from tests.parity import refshim

import jax.numpy as jnp

from boxdreamer_tpu.models import camera_repr

B, T, S, PATCH = 2, 3, 224, 14
G = S // PATCH  # 16


def _rand_poses(seed):
    rng = np.random.default_rng(seed)
    out = np.zeros((B, T, 4, 4))
    for b in range(B):
        for t in range(T):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            out[b, t] = np.eye(4)
            out[b, t, :3, :3] = q
            out[b, t, :3, 3] = rng.standard_normal(3) * 0.2 + [0, 0, 1.5]
    return out.astype(np.float32)


def _rand_K(seed):
    rng = np.random.default_rng(seed + 77)
    K = np.zeros((B, T, 3, 3), np.float32)
    K[..., 0, 0] = rng.uniform(700, 1100, (B, T))
    K[..., 1, 1] = rng.uniform(700, 1100, (B, T))
    K[..., 0, 2] = rng.uniform(100, 124, (B, T))
    K[..., 1, 2] = rng.uniform(100, 124, (B, T))
    K[..., 2, 2] = 1.0
    return K


@pytest.fixture(scope="module")
def ref_mods():
    return (
        refshim.load("src.models.utils.camera_processing"),
        refshim.load("src.models.utils.rays"),
    )


def test_make_camera_rays_golden(ref_mods):
    """Spatial Plücker rays from the real reference make_camera_rays
    (through the real cameras_to_rays + Rays.to_plucker/to_spatial)."""
    cp, _ = ref_mods
    poses, K = _rand_poses(1), _rand_K(1)
    rays, _, _ = cp.make_camera_rays(
        torch.from_numpy(poses), torch.from_numpy(K),
        torch.zeros(B, T, 4), S, PATCH, True,
    )
    theirs = rays.to_spatial().numpy().reshape(B, T, 6, G, G)

    ours = np.asarray(
        camera_repr.make_camera_rays(jnp.asarray(poses), jnp.asarray(K), S, PATCH)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_rays_to_cameras_golden(ref_mods):
    """Pose recovery parity against the CORRECTLY-invoked reference
    rays_to_cameras (cameras passed by keyword, so real intrinsics are
    used — the algorithm camera_processing.py intended)."""
    cp, rays_mod = ref_mods
    poses, K = _rand_poses(2), _rand_K(2)
    rays, cams, _ = cp.make_camera_rays(
        torch.from_numpy(poses), torch.from_numpy(K),
        torch.zeros(B, T, 4), S, PATCH, True,
    )
    cam_rec = rays_mod.rays_to_cameras(rays, None, G, G, cameras=cams)
    R, t, _ = refshim._opencv_from_cameras_projection(
        cam_rec, torch.tensor([[S, S]] * (B * T), dtype=torch.float32)
    )
    theirs = np.tile(np.eye(4, dtype=np.float32), (B * T, 1, 1))
    theirs[:, :3, :3] = R.numpy()
    theirs[:, :3, 3] = t.numpy()
    theirs = theirs.reshape(B, T, 4, 4)

    spatial = rays.to_spatial().numpy().reshape(B, T, 6, G, G)
    ours = np.asarray(
        camera_repr.recover_pose_from_rays(
            jnp.asarray(spatial), jnp.asarray(K), S, coordinate="object"
        )
    )
    # Both must recover the ground-truth poses and agree with each other.
    np.testing.assert_allclose(theirs, poses, atol=5e-3)
    np.testing.assert_allclose(ours, theirs, atol=5e-3)


def test_reference_recover_uses_default_focal_quirk(ref_mods):
    """Document the positional-argument quirk: the reference's own
    recover_pose_from_rays drops the real intrinsics (cameras lands in
    use_half_pix), so its recovered rotations deviate from ground truth
    far more than the correctly-invoked path. If a reference update fixes
    the call, this test fails and our recover path should be re-checked."""
    cp, _ = ref_mods
    poses, K = _rand_poses(3), _rand_K(3)
    rays, cams, _ = cp.make_camera_rays(
        torch.from_numpy(poses), torch.from_numpy(K),
        torch.zeros(B, T, 4), S, PATCH, True,
    )
    rec = cp.recover_pose_from_rays(
        rays, torch.from_numpy(poses), cams, torch.zeros(B, T, 4),
        torch.ones(B, T, 1, G, G), None, S, PATCH, "object",
    ).numpy()

    _, rays_mod = ref_mods
    cam_correct = rays_mod.rays_to_cameras(rays, None, G, G, cameras=cams)
    R, t, _ = refshim._opencv_from_cameras_projection(
        cam_correct, torch.tensor([[S, S]] * (B * T), dtype=torch.float32)
    )
    rec_correct = np.tile(np.eye(4, dtype=np.float32), (B * T, 1, 1))
    rec_correct[:, :3, :3] = R.numpy()
    rec_correct[:, :3, 3] = t.numpy()
    rec_correct = rec_correct.reshape(B, T, 4, 4)

    # The two invocations genuinely diverge (different ray patterns feed
    # the rotation alignment). If this collapses to ~0, the reference call
    # has been fixed and camera_repr should switch to strict parity.
    assert np.abs(rec - rec_correct).max() > 1e-3, (
        "reference recover_pose_from_rays now equals the correctly-invoked "
        "path — the positional-arg bug may have been fixed; revisit "
        "camera_repr"
    )


def test_plucker_spatial_roundtrip_golden(ref_mods):
    """Rays.to_plucker -> to_spatial -> from_spatial -> to_point_direction
    chain vs our plucker conversions on identical ray data."""
    _, rays_mod = ref_mods
    rng = np.random.default_rng(5)
    origins = rng.standard_normal((4, G * G, 3)).astype(np.float32)
    dirs = rng.standard_normal((4, G * G, 3)).astype(np.float32)
    r = rays_mod.Rays(
        origins=torch.from_numpy(origins),
        directions=torch.from_numpy(dirs),
        num_patches_x=G,
        num_patches_y=G,
    )
    pl = r.to_plucker()
    theirs = pl.rays.numpy()

    from boxdreamer_tpu.ops import rays as jrays

    ours = np.asarray(to_np(jrays.to_plucker(jnp.asarray(origins), jnp.asarray(dirs))))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # point+direction recovery
    po, pd = pl.to_point_direction().get_origins(), pl.to_point_direction().get_directions()
    jo, jd = jrays.to_point_direction(jnp.asarray(theirs))
    np.testing.assert_allclose(np.asarray(jo), po.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jd), pd.numpy(), atol=1e-5)


def to_np(x):
    return np.asarray(x)

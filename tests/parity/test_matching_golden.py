"""Golden dense-matching parity: execute the REAL reference matching code
(src/models/utils/matching.py) under torch-CPU and compare our JAX
similarity/selection (models/dense.py)."""

import numpy as np
import pytest
import torch

from tests.parity import refshim

import jax.numpy as jnp

from boxdreamer_tpu.models import dense


@pytest.fixture(scope="module")
def ref_matching():
    return refshim.load("src.models.utils.matching")


def test_gt_neighbor_score_golden(ref_matching):
    """make_gt_neighbor_score (matching.py:7-61) vs gt_neighbor_score."""
    rng = np.random.default_rng(0)
    B, T = 3, 6
    poses = np.zeros((B, T, 4, 4), np.float32)
    for b in range(B):
        for t in range(T):
            q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] *= -1
            poses[b, t] = np.eye(4)
            poses[b, t, :3, :3] = q
            poses[b, t, :3, 3] = rng.standard_normal(3)
    mask = np.zeros((B, T), bool)
    mask[:, -1] = True  # query last (the framework's convention)

    theirs = (
        ref_matching.make_gt_neighbor_score(
            torch.from_numpy(poses), torch.from_numpy(mask)
        )
        .numpy()
        .squeeze(-1)
    )
    ours = np.asarray(dense.gt_neighbor_score(jnp.asarray(poses), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("topk", [3, 5])
def test_dino_matching_golden(ref_matching, topk):
    """dino_matching (matching.py:64-174) vs dino_similarity + topk_gather,
    including the -1e4 fill / count-all-pairs mean quirk."""
    rng = np.random.default_rng(1)
    B, N, G, D, H = 2, 8, 4, 16, 32
    L = G * G
    ref_feat = rng.standard_normal((B, N, L, D)).astype(np.float32)
    q_feat = rng.standard_normal((B, L, D)).astype(np.float32)
    # Images with genuine dark background so the foreground mask bites.
    # Each reference gets a DIFFERENT background fraction: the -1e4 fill on
    # masked pairs then dominates the mean, giving well-separated scores
    # (identical fractions leave scores tied at f32 noise, where the two
    # implementations' summation orders legitimately disagree).
    ref_imgs = rng.uniform(0.2, 1, (B, N, 3, H, H)).astype(np.float32)
    q_imgs = rng.uniform(0.2, 1, (B, 3, H, H)).astype(np.float32)
    for n in range(N):
        dark_rows = (n + 1) * H // (N + 2)
        ref_imgs[:, n, :, :dark_rows, :] = 0.0
    q_imgs[..., :, : H // 2] = 0.0  # left half background

    theirs_mask = ref_matching.dino_matching(
        torch.from_numpy(ref_feat),
        torch.from_numpy(q_feat),
        torch.from_numpy(ref_imgs),
        torch.from_numpy(q_imgs),
        topk=topk,
    ).numpy()

    scores = dense.dino_similarity(
        jnp.asarray(ref_feat), jnp.asarray(q_feat),
        jnp.asarray(ref_imgs), jnp.asarray(q_imgs),
    )
    idx, _ = dense.topk_gather(scores, topk, jnp.asarray(ref_feat))
    ours_mask = np.zeros((B, N), bool)
    for b in range(B):
        ours_mask[b, np.asarray(idx)[b]] = True

    assert theirs_mask.sum() == topk * B
    np.testing.assert_array_equal(ours_mask, theirs_mask)

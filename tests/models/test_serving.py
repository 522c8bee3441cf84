import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from fixture import make_linemod_fixture  # noqa: E402

from boxdreamer_tpu.data import DatasetConfig, build_dataset
from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.models.serving import PoseService

TINY = BoxDreamerConfig(
    betr=BETRConfig(
        d_model=32, nhead=2, num_decoder_layers=1, patch_size=14, img_size=28,
        dtype="float32",
    ),
    dino=DinoViTConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2,
        dtype="float32",
    ),
    pnp_iters=3,
)


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    root = make_linemod_fixture(
        str(tmp_path_factory.mktemp("lm")), n_train=6, n_test=2
    )
    ds = build_dataset(
        "LINEMOD", DatasetConfig(image_size=28, length=4), "test", root=root
    )
    batch = ds[0]
    model = BoxDreamer(TINY)
    T = batch["images"].shape[0]
    mask = jnp.zeros((1, T), dtype=bool).at[:, -1].set(True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["images"])[None],
        jnp.asarray(batch["bbox_feat"])[None],
        mask,
    )
    svc = PoseService(model, params, num_refs=3)
    # Register two objects from the same fixture refs.
    refs = batch["images"][:3]
    poses = batch["poses"][:3]
    Ks = batch["non_ndc_intrinsics"][:3]
    svc.register_object("obj_a", refs, poses, Ks, bbox_3d=batch["bbox_3d"][0])
    svc.register_object("obj_b", refs, poses, Ks)  # visual-hull box
    return svc, batch


def test_registry(service):
    svc, _ = service
    assert sorted(svc.objects()) == ["obj_a", "obj_b"]


def test_predict_both_objects(service):
    svc, batch = service
    q = batch["images"][-1]
    K = batch["non_ndc_intrinsics"][-1]
    for obj in ("obj_a", "obj_b"):
        out = svc.predict(obj, q, K)
        assert out["pose"].shape == (4, 4)
        assert out["keypoints"].shape == (8, 2)
        assert np.isfinite(out["pose"]).all()


def test_predict_batch(service):
    svc, batch = service
    q = np.stack([batch["images"][-1]] * 4)
    K = np.stack([batch["non_ndc_intrinsics"][-1]] * 4)
    poses = svc.predict_batch("obj_a", q, K)
    assert poses.shape == (4, 4, 4)
    # Identical queries -> identical poses.
    np.testing.assert_allclose(poses[0], poses[1], atol=1e-5)


def test_unregister(service):
    svc, _ = service
    svc.unregister_object("obj_b")
    assert svc.objects() == ["obj_a"]
    with pytest.raises(KeyError):
        svc.predict("obj_b", np.zeros((3, 28, 28), np.float32), np.eye(3))

"""FULL-MODEL golden parity: execute the REAL reference BoxDreamer
nn.Module (src/models/BoxDreamerModel.py — vendored DINOv2 encoder through
a torch.hub shim + the real BETR decoder + the real eval decode path) on a
real reference dataset item, convert its random weights into our Flax
model, and compare the predicted query heatmaps and decoded keypoints.

This is the capstone over the per-module goldens: it exercises the exact
module wiring (mask normalization, frozen-encoder predict, camera-mask
construction from query_idx, pred_bbox scatter) end-to-end.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from fixture import make_linemod_fixture  # noqa: E402

from tests.parity import refshim
from tests.parity.test_dataset_golden import LENGTH, _Cfg, _ref_base_config

import jax.numpy as jnp

from boxdreamer_tpu.models import weights as jweights
from boxdreamer_tpu.models.betr import BETRConfig
from boxdreamer_tpu.models.boxdreamer import (
    BoxDreamer,
    BoxDreamerConfig,
    forward_with_pose,
)
from boxdreamer_tpu.models.dinov2 import DinoViTConfig


def _module_config():
    """configs/model/transformer.yaml:10-68 with the repo eval defaults."""
    return _Cfg(
        use_keypoints=False,
        use_matching=False,
        use_tracking=False,
        use_rgb=True,
        use_pp=True,
        ref_type="all",
        regression_intri=True,
        rotation_type=None,
        coordinate="object",
        pose_representation="bb8",
        bbox_representation="heatmap",
        patchify_rays=True,
        stage="decoder_only",
        dense_cfg=_Cfg(
            enable=False, filter_enable=True, filter="dino", filter_topk=5,
            multi_round=False, sub_batch_size=5, fine_level=False,
            fine_topk=5, dense_mem_friendly=False,
        ),
        decoder=_Cfg(
            d_model=768, nhead=8, num_decoder_layers=12, camera_emb="MLP",
            track_emb=None, match_emb=None, decoder_only=True,
            patch_size=14, img_size=224, diff_emb=False,
            nvs_supervision=False, ray_supervision=True, use_mask=False,
        ),
        tracker=_Cfg(ckpt_path=None, cfg=_Cfg(grid_size=20, freeze=True)),
        encoder=_Cfg(
            name="dino",
            dino=_Cfg(
                ckpt_path=None,
                cfg=_Cfg(model_type="dinov2_vitb14_reg", freeze=True),
            ),
        ),
    )


def _hub_shim(monkeypatch):
    """torch.hub.load('facebookresearch/dinov2', 'dinov2_vitb14_reg') ->
    the reference's own vendored DinoVisionTransformer (ViT-B/14-reg at
    the hub's 518px pos grid), with .to() ignoring the wrapper's
    hardcoded 'cuda'."""
    vt = refshim.load("src.models.sources.DINOv2.vision_transformer")

    class _CpuViT(vt.DinoVisionTransformer):
        def to(self, *a, **k):  # noqa: D401 - wrapper calls .to('cuda')
            return self

    def fake_hub_load(repo, model_type, **kw):
        assert model_type == "dinov2_vitb14_reg"
        torch.manual_seed(7)
        m = _CpuViT(
            img_size=518, patch_size=14, embed_dim=768, depth=12,
            num_heads=12, num_register_tokens=4, init_values=1.0,
            block_chunks=0,
        )
        with torch.no_grad():
            for p in m.parameters():
                if p.ndim >= 2:
                    p.mul_(0.1 / 0.02)
        return m.eval()

    monkeypatch.setattr(torch.hub, "load", fake_hub_load)


@pytest.mark.slow
def test_full_model_forward_golden(tmp_path, monkeypatch):
    # ---- reference dataset item -> batch of 1
    root = make_linemod_fixture(str(tmp_path / "lm"))
    lm = refshim.load("src.datasets.linemod")
    ds_cfg = _Cfg(
        base=_ref_base_config(), root=root, cat_filter=None,
        model_suffix=None, reference_suffix=None,
    )
    item = lm.LINEMOD_BoxDreamer(ds_cfg, "test")[(0, None)]
    batch_t = {}
    for k, v in item.items():
        if isinstance(v, torch.Tensor):
            batch_t[k] = v[None].clone()
    batch_t["query_idx"] = torch.tensor([int(item["query_idx"])])

    # ---- real reference model with shimmed hub encoder
    _hub_shim(monkeypatch)
    bm = refshim.load("src.models.BoxDreamerModel")
    torch.manual_seed(3)
    ref_model = bm.BoxDreamer(_Cfg(modules=_module_config())).eval()
    with torch.no_grad():
        out = ref_model({k: (v.clone() if torch.is_tensor(v) else v)
                         for k, v in batch_t.items()})
    q = int(item["query_idx"])
    theirs_heat = out["pred_bbox"][0, q].numpy()  # (8, 224, 224)

    # ---- convert weights into our Flax model (block_chunks=0 gives plain
    # 'blocks.N.' naming, matching the hub checkpoints directly). The
    # DinoV2Wrapper is NOT an nn.Module (encoder/base.py:3), so the frozen
    # encoder never appears in the reference state dict — merge it in under
    # the released-safetensors prefix, exactly what a user loading the hub
    # weights alongside a BoxDreamer checkpoint does.
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    sd.update(
        {
            f"rgb_encoder.model.{k}": v.numpy()
            for k, v in ref_model.rgb_encoder.model.state_dict().items()
        }
    )
    cfg = BoxDreamerConfig(
        betr=BETRConfig(dtype="float32"),
        dino=DinoViTConfig(dtype="float32"),
    )
    converted = jweights.convert_boxdreamer(
        sd,
        dino_cfg=cfg.dino,
        betr_cfg=cfg.betr,
        decoder_prefix="decoder.",
        encoder_prefix="rgb_encoder.model.",
    )

    model = BoxDreamer(cfg)
    jbatch = {
        "images": jnp.asarray(batch_t["images"].numpy()),
        "bbox_feat": jnp.asarray(batch_t["bbox_feat"].numpy()),
        "query_idx": jnp.asarray([q]),
        "bbox_3d": jnp.asarray(batch_t["bbox_3d"].numpy()),
        "non_ndc_intrinsics": jnp.asarray(batch_t["non_ndc_intrinsics"].numpy()),
    }
    ours = forward_with_pose(model, converted, jbatch)
    ours_heat = np.asarray(ours["pred_bbox"])[0]

    scale = max(float(np.abs(theirs_heat).mean()), 1e-6)
    np.testing.assert_allclose(
        ours_heat / scale, theirs_heat / scale, atol=2e-3
    )

    # ---- training-loss composition: the reference Loss on the reference
    # model's scattered pred_bbox vs our Loss on our scattered prediction
    # (configs/model/loss/default.yaml: one masked smooth_l1 term).
    loss_mod = refshim.load("src.loss.loss")
    import types as _types

    ref_loss = loss_mod.Loss(
        _types.SimpleNamespace(
            losses=[
                _types.SimpleNamespace(
                    type="smooth_l1", weight=[1.0, 0.0], pred_key="pred_bbox",
                    gt_key="bbox_feat", mask_key="camera_mask",
                )
            ]
        )
    )
    total_ref, _ = ref_loss(out)

    from boxdreamer_tpu.training.loss import Loss as JLoss
    from boxdreamer_tpu.training.loss import LossTerm
    from boxdreamer_tpu.training.train_step import scatter_query_prediction
    from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx

    cmask = camera_mask_from_query_idx(jbatch["query_idx"], LENGTH)
    data = {
        "pred_bbox": scatter_query_prediction(
            jbatch["bbox_feat"], ours["pred_bbox"], cmask
        ),
        "bbox_feat": jbatch["bbox_feat"],
        "camera_mask": cmask,
    }
    total_ours, _ = JLoss([LossTerm(weight=(1.0, 0.0))])(data)
    np.testing.assert_allclose(
        float(total_ours), float(total_ref), rtol=2e-3
    )

    # ---- decoded keypoints: run the REAL reference decode on its own
    # heatmaps (the layout prediction_utils.py:65-76 uses) and compare our
    # jitted decode output.
    bu = refshim.load("src.models.utils.box_utils")
    decode_in = (
        torch.from_numpy(theirs_heat).permute(1, 2, 0)[None, None].contiguous()
    )  # (1, 1, H, W, 8)
    norm_ref, kpts_ref = bu.recover_bb8_corners(decode_in, "heatmap")
    np.testing.assert_allclose(
        np.asarray(ours["pred_kpts_2d"])[0], kpts_ref.numpy()[0, 0], atol=0.1
    )
    np.testing.assert_allclose(
        np.asarray(ours["pred_kpts_2d_normalized"])[0],
        norm_ref.numpy()[0, 0],
        atol=1e-3,
    )

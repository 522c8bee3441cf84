"""Twin-training dynamics golden: the REAL reference trainer loop vs ours.

Every piece of the training stack is golden-tested individually (model
forward, loss composition, LR ramps, optimizer config) — this test is the
joint check: train the REAL reference BoxDreamer nn.Module (refshim
torch-CPU: src/models/BoxDreamerModel.py forward in train mode +
src/loss/loss.py Loss + the real build_optimizer/build_scheduler from
src/lightning/utils/optimizers/optimizers.py:96-182, mirroring
training_step at src/lightning/BoxDreamer_lightning_model.py:88-124 with
Lightning's gradient_clip_val=0.5 from configs/trainer/default.yaml) and
our trainer (make_train_step + build_optimizer) from IDENTICAL converted
weights, the same fixed data order, the same warmup+cosine schedule, f32,
for 150 steps — and assert the loss trajectories agree and stay close.

Geometry is tiny-but-flagship-shaped so 2x150 CPU steps stay fast:
img_size 56 (4x4 patches/frame), DINOv2 depth 2, BETR depth 3 — d_model
768, nhead 8, frozen encoder, bb8/heatmap, the flagship training recipe
otherwise. Dropout is zeroed on BOTH sides (the reference camera-embedding
MLP carries drop=0.1, betr.py:159): stochastic dropout cannot be
seed-matched across frameworks, and the comparison targets the
optimizer+loss+model+data-pipeline composition, not RNG reproduction.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "data"))
from fixture import make_linemod_fixture  # noqa: E402

from tests.parity import refshim
from tests.parity.test_dataset_golden import _Cfg, _ref_base_config

import jax
import jax.numpy as jnp

from boxdreamer_tpu.models import weights as jweights
from boxdreamer_tpu.models.betr import BETRConfig
from boxdreamer_tpu.models.boxdreamer import BoxDreamer, BoxDreamerConfig
from boxdreamer_tpu.models.dinov2 import DinoViTConfig
from boxdreamer_tpu.training.loss import Loss as JLoss
from boxdreamer_tpu.training.loss import LossTerm
from boxdreamer_tpu.training.optim import OptimConfig, build_optimizer
from boxdreamer_tpu.training.train_step import TrainState, make_train_step

IMG = 56
DINO_DEPTH = 2
BETR_DEPTH = 3
STEPS = 150
WARMUP = 10
TMAX = 140
LR = 4e-4
CLIP = 0.5  # configs/trainer/default.yaml:8


def _tiny_module_config():
    """_module_config() of test_model_golden at twin geometry."""
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
            d_model=768, nhead=8, num_decoder_layers=BETR_DEPTH,
            camera_emb="MLP", track_emb=None, match_emb=None,
            decoder_only=True, patch_size=14, img_size=IMG, diff_emb=False,
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


def _tiny_hub_shim(monkeypatch):
    """dinov2_vitb14_reg hub load -> the vendored DinoVisionTransformer at
    twin depth (2 blocks, still ViT-B width)."""
    vt = refshim.load("src.models.sources.DINOv2.vision_transformer")

    class _CpuViT(vt.DinoVisionTransformer):
        def to(self, *a, **k):  # wrapper calls .to('cuda')
            return self

    def fake_hub_load(repo, model_type, **kw):
        assert model_type == "dinov2_vitb14_reg"
        torch.manual_seed(7)
        m = _CpuViT(
            img_size=518, patch_size=14, embed_dim=768, depth=DINO_DEPTH,
            num_heads=12, num_register_tokens=4, init_values=1.0,
            block_chunks=0,
        )
        with torch.no_grad():
            for p in m.parameters():
                if p.ndim >= 2:
                    p.mul_(0.1 / 0.02)
        return m.eval()

    monkeypatch.setattr(torch.hub, "load", fake_hub_load)


def _ref_items(tmp_path):
    root = make_linemod_fixture(str(tmp_path / "lm"))
    lm = refshim.load("src.datasets.linemod")
    base = _ref_base_config()
    base["image_size"] = IMG
    ds_cfg = _Cfg(
        base=base, root=root, cat_filter=None,
        model_suffix=None, reference_suffix=None,
    )
    ds = lm.LINEMOD_BoxDreamer(ds_cfg, "test")
    items = []
    for i in range(3):
        item = ds[(i, None)]
        b = {
            k: v[None].clone()
            for k, v in item.items()
            if isinstance(v, torch.Tensor)
        }
        b["query_idx"] = torch.tensor([int(item["query_idx"])])
        items.append(b)
    return items


def _opt_cfg_dict():
    """The reference opt config group (configs/model/opt/default.yaml keys)
    at the twin schedule."""
    return {
        "opt": {
            "optimizer": "adamw",
            "true_lr": LR,
            "adam_decay": 0.0,
            "adamw_decay": 0.1,
            "adamw_amsgrad": False,
            "scheduler": "CosineAnnealing",
            "scheduler_invervel": "step",
            "cosa_tmax": TMAX,
            "cosa_eta_min": 1e-6,
            "use_warmup": True,
            "warmup_steps": WARMUP,
            "warmup_type": "linear",
        }
    }


@pytest.mark.slow
def test_twin_training_dynamics(tmp_path, monkeypatch):
    items = _ref_items(tmp_path)

    # ---- reference model + its own optimizer/scheduler builders
    _tiny_hub_shim(monkeypatch)
    bm = refshim.load("src.models.BoxDreamerModel")
    torch.manual_seed(3)
    ref_model = bm.BoxDreamer(_Cfg(modules=_tiny_module_config()))
    ref_model.train()
    for m in ref_model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

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

    opt_mod = refshim.load("src.lightning.utils.optimizers.optimizers")
    cfgd = _opt_cfg_dict()
    optimizer = opt_mod.build_optimizer(ref_model, cfgd)
    sched = opt_mod.build_scheduler(cfgd, optimizer, max_step=TMAX)["scheduler"]

    # ---- snapshot the INITIAL weights for conversion (before any step)
    sd = {k: v.numpy().copy() for k, v in ref_model.state_dict().items()}
    sd.update(
        {
            f"rgb_encoder.model.{k}": v.numpy().copy()
            for k, v in ref_model.rgb_encoder.model.state_dict().items()
        }
    )

    # ---- reference train loop (training_step: model(batch) -> loss ->
    # clip(0.5) -> optimizer.step() -> scheduler.step())
    ref_losses = []
    for step in range(STEPS):
        data = {k: v.clone() for k, v in items[step % len(items)].items()}
        optimizer.zero_grad()
        ref_model(data)
        total, _ = ref_loss(data)
        total.backward()
        torch.nn.utils.clip_grad_norm_(
            [p for g in optimizer.param_groups for p in g["params"]], CLIP
        )
        optimizer.step()
        sched.step()
        ref_losses.append(float(total.detach()))

    # ---- our twin from the identical converted initial weights
    cfg = BoxDreamerConfig(
        betr=BETRConfig(
            dtype="float32", num_decoder_layers=BETR_DEPTH, img_size=IMG,
            adapter_dropout=0.0,
        ),
        dino=DinoViTConfig(dtype="float32", depth=DINO_DEPTH, img_size=IMG),
    )
    converted = jweights.convert_boxdreamer(
        sd,
        dino_cfg=cfg.dino,
        betr_cfg=cfg.betr,
        decoder_prefix="decoder.",
        encoder_prefix="rgb_encoder.model.",
    )
    model = BoxDreamer(cfg)
    optim_cfg = OptimConfig(
        optimizer="adamw", lr=LR, adamw_decay=0.1,
        scheduler="CosineAnnealing", cosa_tmax=TMAX, cosa_eta_min=1e-6,
        use_warmup=True, warmup_steps=WARMUP, warmup_type="linear",
        grad_clip_norm=CLIP, frozen_prefixes=("encoder",),
    )
    tx = build_optimizer(optim_cfg, converted)
    state = TrainState(
        step=jnp.asarray(0), params=converted, opt_state=tx.init(converted)
    )
    train_step = make_train_step(model, JLoss([LossTerm()]), tx,
                                 deterministic=True)

    jbatches = []
    for b in items:
        jbatches.append(
            {
                "images": jnp.asarray(b["images"].numpy()),
                "bbox_feat": jnp.asarray(b["bbox_feat"].numpy()),
                "query_idx": jnp.asarray(b["query_idx"].numpy()),
            }
        )

    rng = jax.random.PRNGKey(0)  # inert: deterministic=True
    our_losses = []
    for step in range(STEPS):
        state, metrics = train_step(state, jbatches[step % len(jbatches)], rng)
        our_losses.append(float(metrics["loss"]))

    ref_arr = np.asarray(ref_losses)
    our_arr = np.asarray(our_losses)

    # Trajectories: tight at step 0 (pure forward+loss parity), loose late
    # (f32 rounding differences compound through 150 optimizer steps).
    np.testing.assert_allclose(our_arr[0], ref_arr[0], rtol=1e-3)
    np.testing.assert_allclose(our_arr[:10], ref_arr[:10], rtol=1e-2)
    np.testing.assert_allclose(our_arr, ref_arr, rtol=0.15)

    # Both trainers actually learned: the loss fell substantially, by the
    # same amount.
    assert ref_arr[-1] < 0.5 * ref_arr[0], (ref_arr[0], ref_arr[-1])
    assert our_arr[-1] < 0.5 * our_arr[0], (our_arr[0], our_arr[-1])
    np.testing.assert_allclose(
        np.mean(our_arr[-10:]), np.mean(ref_arr[-10:]), rtol=0.1
    )

    # ---- final model equivalence beyond the loss scalar: the trained
    # models' query heatmaps on a held-out ordering agree.
    ref_model.eval()
    data = {k: v.clone() for k, v in items[1].items()}
    with torch.no_grad():
        # train-mode forward skips PnP eval post-processing; keep it that
        # way for speed but in eval dropout state (dropout already zeroed).
        ref_model.train()
        ref_model(data)
    q = int(items[1]["query_idx"][0])
    theirs = data["pred_bbox"][0, q].numpy()

    from boxdreamer_tpu.models.boxdreamer import camera_mask_from_query_idx

    cmask = camera_mask_from_query_idx(jbatches[1]["query_idx"],
                                       jbatches[1]["images"].shape[1])
    ours = model.apply(
        state.params, jbatches[1]["images"], jbatches[1]["bbox_feat"],
        cmask, deterministic=True,
    )
    ours = np.asarray(ours)[0]
    scale = max(float(np.abs(theirs).mean()), 1e-6)
    diff = np.abs(ours - theirs) / scale
    # After 150 independent f32 optimizer steps a handful of pixels drift
    # past a tight tolerance; require near-total agreement plus a hard cap.
    assert (diff <= 0.05).mean() > 0.995, (diff.max(), (diff > 0.05).sum())
    assert diff.max() < 0.5, diff.max()

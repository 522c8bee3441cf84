"""Golden parity for the BETR auxiliary/experimental heads (VERDICT r4 #4):

- the non-patchified ray head (reference betr.py:136-140, _generate_output
  :403-416 with patchify_rays=False): full forward parity against the REAL
  reference module executed under torch-CPU;
- the NVS rgb_proj head (betr.py:133-134): the reference constructs it but
  never calls it in forward, so the golden captures the reference's
  query_camera_feat via a forward hook and drives its rgb_proj by hand,
  comparing against our return_aux output;
- the from-scratch diff_emb embedding family (betr.py:191-208), including
  the dead input_query_ray_emb parameter and the reference's latent
  bbox_learnable_query shape bug (the diff_emb branch overwrites the
  query with a (1, d_model) tensor that only fits the masked assignment at
  betr.py:287-290 when d_model == patch_size^2*box_dim — pinned, not
  "fixed").
"""

import numpy as np
import pytest
import torch

from parity import refshim

from boxdreamer_tpu.models.betr import BETR, BETRConfig
from boxdreamer_tpu.models.weights import convert_betr

IMG = 56  # 4x4 patch grid per frame
D_MODEL = 64
NHEAD = 2
LAYERS = 1


def _make_ref(seed=0, **kw):
    ref_betr_mod = refshim.load("src.models.modules.backbone.betr")
    torch.manual_seed(seed)
    args = dict(
        d_model=D_MODEL,
        nhead=NHEAD,
        num_decoder_layers=LAYERS,
        decoder_only=True,
        patch_size=14,
        img_size=IMG,
        nvs_supervision=False,
        ray_supervision=True,
        use_mask=False,
        patchify_rays=True,
        pose_representation="bb8",
        bbox_representation="heatmap",
        diff_emb=False,
        use_pretrained=True,
    )
    args.update(kw)
    model = ref_betr_mod.BETR(**args)
    model.eval()
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.25, 0.25, generator=gen)
    return model


def _inputs(box_dim, spatial, B=1, T=3, seed=3, d_model=D_MODEL):
    """``spatial``: pose_feat side length — the patch GRID for plucker
    (rays arrive as tokens) but the full image size for bb8 (the reference
    patchifies bbox feature maps itself, betr.py:325,344)."""
    rng = np.random.default_rng(seed)
    P = (IMG // 14) ** 2
    pose_feat = rng.uniform(
        -1, 1, (B, T, box_dim, spatial, spatial)
    ).astype(np.float32)
    rgbs = rng.uniform(0, 1, (B, T, 3, IMG, IMG)).astype(np.float32)
    tokens = rng.normal(0, 1, (B, T, P, d_model)).astype(np.float32)
    masks = np.zeros((B, T), dtype=bool)
    masks[:, -1] = True
    return pose_feat, rgbs, tokens, masks


def _repair_plucker_query(ref, seed=9):
    """Reference bug, pinned: the plucker pretrained path never creates
    bbox_learnable_query (_initialize_pretrained_embeddings, betr.py:163-164
    only builds ray_emb) yet forward unconditionally reads it at :287-290 —
    the as-shipped plucker forward AttributeErrors. The intended parameter
    is (1, d_model) (the masked slots are ray_emb outputs of d_model), which
    is exactly what our implementation declares; add it so the real code can
    execute.

    Second plucker latent bug, same treatment: _initialize_feature_dimensions
    (betr.py:93-99) adds cat_dim += 6 for plucker but never sets self.box_dim
    (only the bb8 branch does), yet _generate_output's sigmoid gate reads
    self.box_dim (:431) -> AttributeError. The implied value is 6 (no
    sigmoid), which is what our _plucker_forward hardcodes."""
    gen = torch.Generator().manual_seed(seed)
    ref.bbox_learnable_query = torch.nn.Parameter(
        torch.empty(1, D_MODEL).uniform_(-0.25, 0.25, generator=gen)
    )
    ref.box_dim = 6


def test_plucker_nonpatchified_head_golden():
    """patchify_rays=False: per-token p^2*6 head unpatchified to
    full-resolution rays. Patch-grid ray INPUT + full-res output — the only
    executable arrangement of the reference code (see BETRConfig note)."""
    g = IMG // 14
    ref = _make_ref(pose_representation="plucker", patchify_rays=False)
    _repair_plucker_query(ref)
    rays, rgbs, tokens, masks = _inputs(6, g)

    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(rays),
            rgbs=torch.from_numpy(rgbs),
            masks=torch.from_numpy(masks),
            pretrain_rgb_feat=torch.from_numpy(tokens),
        ).numpy()
    assert out_ref.shape == (1, 6, IMG, IMG)  # full-resolution rays out

    cfg = BETRConfig(
        d_model=D_MODEL, nhead=NHEAD, num_decoder_layers=LAYERS,
        patch_size=14, img_size=IMG, pose_representation="plucker",
        patchify_rays=False, dtype="float32",
    )
    params = convert_betr(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
    )
    out_jax = np.asarray(
        BETR(cfg).apply(
            {"params": params}, rays, rgbs, masks, pretrain_rgb_feat=tokens
        )
    )
    np.testing.assert_allclose(out_jax, out_ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("representation", ["bb8", "plucker"])
def test_nvs_rgb_head_golden(representation):
    """rgb_proj parity: the reference never calls its NVS head in forward,
    so capture query_camera_feat with a hook on the head that IS called
    (bbox_proj / camera_ray_proj) and drive rgb_proj by hand."""
    g = IMG // 14
    kw = dict(nvs_supervision=True)
    if representation == "plucker":
        kw.update(pose_representation="plucker")
        box_dim, spatial = 6, g  # rays arrive at patch-grid resolution
    else:
        box_dim, spatial = 8, IMG  # bbox maps arrive full-res, patchified
    ref = _make_ref(**kw)
    if representation == "plucker":
        _repair_plucker_query(ref)
    pose_feat, rgbs, tokens, masks = _inputs(box_dim, spatial)

    captured = {}
    head = ref.bbox_proj if representation == "bb8" else ref.camera_ray_proj
    head.register_forward_hook(
        lambda mod, inp, out: captured.__setitem__("feat", inp[0].detach())
    )
    with torch.no_grad():
        out_ref = ref(
            torch.from_numpy(pose_feat),
            rgbs=torch.from_numpy(rgbs),
            masks=torch.from_numpy(masks),
            pretrain_rgb_feat=torch.from_numpy(tokens),
        ).numpy()
        nvs_tok = ref.rgb_proj(captured["feat"])  # (T_q*P, p^2*3) tokens
        nvs_ref = ref.unpatchify(nvs_tok.reshape(1, g * g, -1), c=3).numpy()

    cfg = BETRConfig(
        d_model=D_MODEL, nhead=NHEAD, num_decoder_layers=LAYERS,
        patch_size=14, img_size=IMG, dtype="float32", nvs_supervision=True,
        pose_representation=(
            "plucker" if representation == "plucker" else "bb8"
        ),
    )
    params = convert_betr(
        {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
    )
    out_jax, aux = BETR(cfg).apply(
        {"params": params}, pose_feat, rgbs, masks, pretrain_rgb_feat=tokens,
        return_aux=True,
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_ref, rtol=2e-4, atol=2e-4)
    assert aux["nvs_rgb"].shape == (1, 3, IMG, IMG)
    np.testing.assert_allclose(
        np.asarray(aux["nvs_rgb"]), nvs_ref, rtol=2e-4, atol=2e-4
    )


def test_diff_emb_scratch_embedding_family_golden():
    """From-scratch diff_emb embeddings (betr.py:191-208): the param family
    (input_ref_emb / input_query_rgb_emb / dead input_query_ray_emb) exists
    on both sides with transposed-equal shapes; and the reference's latent
    bbox_learnable_query shape bug is pinned as-is."""
    ref = _make_ref(
        use_pretrained=False, diff_emb=True, nvs_supervision=True,
        ray_supervision=True,
    )
    sd = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    p2cat = 14 * 14 * (3 + 8)  # cat_dim = rgb 3 + heatmap 8
    assert sd["input_ref_emb.weight"] == (D_MODEL, p2cat)
    assert sd["input_query_rgb_emb.weight"] == (D_MODEL, p2cat)
    # Dead parameter (created at betr.py:204-208, never read in forward).
    assert sd["input_query_ray_emb.weight"] == (D_MODEL, p2cat)
    # Latent quirk: diff_emb OVERWRITES the query to (1, d_model)
    # (betr.py:196), which cannot be assigned into the p^2*box_dim pose
    # slots at betr.py:287-290 unless d_model == p^2*box_dim.
    assert sd["bbox_learnable_query"] == (1, D_MODEL)

    pose_feat, rgbs, tokens, masks = _inputs(8, IMG)
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            ref(
                torch.from_numpy(pose_feat),
                rgbs=torch.from_numpy(rgbs),
                masks=torch.from_numpy(masks),
            )

    # Our tree: same embedding family (kernels transposed), a usable
    # (1, p^2*box_dim) query instead of the broken overwrite.
    cfg = BETRConfig(
        d_model=D_MODEL, nhead=NHEAD, num_decoder_layers=LAYERS,
        patch_size=14, img_size=IMG, dtype="float32", use_pretrained=False,
        diff_emb=True, nvs_supervision=True,
    )
    variables = BETR(cfg).init(
        __import__("jax").random.PRNGKey(0), pose_feat, rgbs, masks
    )
    p = variables["params"]
    for name in ("input_ref_emb", "input_query_rgb_emb", "input_query_ray_emb"):
        assert p[name]["kernel"].shape == (p2cat, D_MODEL), name
    assert p["bbox_learnable_query"].shape == (1, 14 * 14 * 8)
    assert p["rgb_proj"]["kernel"].shape == (D_MODEL, 14 * 14 * 3)

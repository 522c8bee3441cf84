"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from boxdreamer_tpu.models import BoxDreamer, BoxDreamerConfig, BETRConfig, DinoViTConfig
from boxdreamer_tpu.parallel import mesh as mesh_lib
from boxdreamer_tpu.training import loss as loss_lib
from boxdreamer_tpu.training.optim import OptimConfig
from boxdreamer_tpu.training.train_step import create_train_state, make_train_step

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


def tiny_batch(key, B=8, T=2):
    k = jax.random.split(key, 3)
    return {
        "images": jax.random.uniform(k[0], (B, T, 3, 28, 28)),
        "bbox_feat": jax.random.uniform(k[1], (B, T, 8, 28, 28)) * 2 - 1,
        "query_idx": jnp.array([1] * B),
    }


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = mesh_lib.make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_param_sharding_rules():
    mesh = mesh_lib.make_mesh(data=4, model=2)
    model = BoxDreamer(TINY)
    batch = tiny_batch(jax.random.PRNGKey(0), B=2)
    mask = jnp.zeros((2, 2), dtype=bool).at[:, 1].set(True)
    shapes = jax.eval_shape(
        lambda r: model.init(r, batch["images"], batch["bbox_feat"], mask),
        jax.random.PRNGKey(1),
    )
    shardings = mesh_lib.param_shardings(mesh, shapes)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    qkv = [s for p, s in flat if "qkv" in str(p) and "kernel" in str(p)]
    proj = [s for p, s in flat if "attn" in str(p) and "proj" in str(p) and "kernel" in str(p)]
    assert qkv and all(s.spec == P(None, "model") for s in qkv)
    assert proj and all(s.spec == P("model", None) for s in proj)


def test_dp_tp_train_step_on_8_devices():
    """Full train step over a 4x2 (data x model) mesh: must compile, run,
    and agree with the single-device step."""
    mesh = mesh_lib.make_mesh(data=4, model=2)
    model = BoxDreamer(TINY)
    batch = tiny_batch(jax.random.PRNGKey(0))
    optim_cfg = OptimConfig(lr=1e-3, use_warmup=False, scheduler="constant")

    # Single-device baseline.
    state1, tx1 = create_train_state(model, optim_cfg, jax.random.PRNGKey(1), batch)
    step1 = make_train_step(model, loss_lib.Loss(), tx1)
    _, m1 = step1(state1, batch, jax.random.PRNGKey(7))

    # Sharded run.
    state2, tx2 = create_train_state(
        model, optim_cfg, jax.random.PRNGKey(1), batch, mesh=mesh
    )
    sharded_batch = jax.device_put(batch, mesh_lib.batch_sharding(mesh))
    step2 = make_train_step(model, loss_lib.Loss(), tx2)
    new_state, m2 = step2(state2, sharded_batch, jax.random.PRNGKey(7))
    jax.block_until_ready(new_state.params)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)

    # qkv kernels really are sharded over the model axis.
    qkv = new_state.params["params"]["decoder"]["block_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxdreamer_tpu.training import checkpoint as C
from boxdreamer_tpu.training.train_step import TrainState


def make_state(seed=0, extra_dim=4):
    k = jax.random.PRNGKey(seed)
    params = {
        "params": {
            "dense": {"kernel": jax.random.normal(k, (3, extra_dim)), "bias": jnp.zeros(extra_dim)},
        }
    }
    return TrainState(step=jnp.asarray(7), params=params, opt_state=(jnp.zeros(2),))


def test_save_restore_roundtrip(tmp_path):
    state = make_state()
    path = str(tmp_path / "ckpt")
    C.save_checkpoint(path, state)
    restored = C.restore_checkpoint(path, jax.tree_util.tree_map(np.zeros_like, state))
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["params"]["dense"]["kernel"]),
        np.asarray(state.params["params"]["dense"]["kernel"]),
    )


def test_pretrained_load_skips_mismatched_shapes(tmp_path):
    state = make_state(extra_dim=4)
    path = str(tmp_path / "pre")
    C.save_checkpoint(path, state.params)
    # Target with a mismatched kernel shape: kernel kept from init, bias loaded.
    target = {
        "params": {
            "dense": {
                "kernel": jnp.ones((3, 8)),
                "bias": jnp.full((4,), 5.0),
            }
        }
    }
    merged = C.load_pretrained_params(path, target)
    np.testing.assert_allclose(np.asarray(merged["params"]["dense"]["kernel"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(merged["params"]["dense"]["bias"]), 0.0
    )  # loaded zeros


def test_resolve_resume_precedence(tmp_path):
    resume = str(tmp_path / "resume")
    pre = str(tmp_path / "pre")
    # Neither exists -> fresh.
    assert C.resolve_resume(resume, pre, True, True) == (None, "fresh")
    os.makedirs(pre)
    assert C.resolve_resume(resume, pre, True, True) == (pre, "pretrained")
    os.makedirs(resume)
    # Resume wins over pretrained (reference run.py:109-152).
    assert C.resolve_resume(resume, pre, True, True) == (resume, "resume")
    # resume=False ignores the resume ckpt.
    assert C.resolve_resume(resume, pre, False, True) == (pre, "pretrained")
    assert C.resolve_resume(resume, pre, False, False) == (None, "fresh")


def test_checkpoint_manager(tmp_path):
    mgr = C.CheckpointManager(str(tmp_path / "ckpts"), every_n_steps=2)
    s7 = make_state()
    assert not mgr.maybe_save_step(s7)  # step 7 % 2 != 0
    s8 = TrainState(step=jnp.asarray(8), params=s7.params, opt_state=s7.opt_state)
    assert mgr.maybe_save_step(s8)
    mgr.save_last(s8)
    mgr.wait()
    assert os.path.exists(mgr.last_path)
    assert mgr.maybe_save_best(s8, 1.0)
    assert not mgr.maybe_save_best(s8, 2.0)
    assert mgr.maybe_save_best(s8, 0.5)

"""Golden LR-schedule parity: execute the REAL reference WarmupScheduler +
torch base schedulers (/root/reference/src/lightning/utils/optimizers/
optimizers.py) and assert our optax schedule emits the same LR at every
step. This caught two real ramp-shape bugs (exponential is alpha^3, cosine
is a quarter-wave) in the hand-written version."""

import math

import numpy as np
import pytest
import torch

from tests.parity import refshim

from boxdreamer_tpu.training import optim as joptim


def _ref_lrs(warmup_type, scheduler, steps, lr=4e-4, warmup=10, **kw):
    mod = refshim.load("src.lightning.utils.optimizers.optimizers")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    if scheduler == "CosineAnnealing":
        base = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=kw["tmax"], eta_min=kw["eta_min"]
        )
    elif scheduler == "MultiStepLR":
        base = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(kw["milestones"]), gamma=kw["gamma"]
        )
    elif scheduler == "ExponentialLR":
        base = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=kw["gamma"])
    else:
        base = None
    sched = mod.WarmupScheduler(
        opt, warmup_steps=warmup, base_scheduler=base, warmup_type=warmup_type
    )
    lrs = []
    for _ in range(steps):
        # Reference flow: read the lr the scheduler installed for this step,
        # then advance (Lightning calls scheduler.step() after each step).
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    return np.array(lrs)


def _our_lrs(warmup_type, scheduler, steps, lr=4e-4, warmup=10, **kw):
    cfg = joptim.OptimConfig(
        lr=lr,
        scheduler=scheduler,
        use_warmup=True,
        warmup_steps=warmup,
        warmup_type=warmup_type,
        cosa_tmax=kw.get("tmax", 500),
        cosa_eta_min=kw.get("eta_min", 1e-6),
        mslr_milestones=kw.get("milestones", (30, 50)),
        mslr_gamma=kw.get("gamma", 0.5),
        elr_gamma=kw.get("gamma", 0.99),
    )
    sched = joptim.build_schedule(cfg)
    return np.array([float(sched(i)) for i in range(steps)])


@pytest.mark.parametrize("warmup_type", ["linear", "exponential", "cosine"])
def test_warmup_ramp_matches_reference(warmup_type):
    """During warmup the reference installs base_lr * ramp(epoch/warmup)."""
    ref = _ref_lrs(warmup_type, "constant", steps=10, warmup=10)
    ours = _our_lrs(warmup_type, "constant", steps=10, warmup=10)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)  # f32 schedule eval


def test_cosine_annealing_after_warmup_matches_reference():
    w, tmax = 5, 40
    ref = _ref_lrs("linear", "CosineAnnealing", steps=w + tmax, warmup=w,
                   tmax=tmax, eta_min=1e-6)
    ours = _our_lrs("linear", "CosineAnnealing", steps=w + tmax, warmup=w,
                    tmax=tmax, eta_min=1e-6)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multistep_after_warmup_matches_reference():
    w = 4
    ref = _ref_lrs("linear", "MultiStepLR", steps=30, warmup=w,
                   milestones=(8, 16), gamma=0.5)
    ours = _our_lrs("linear", "MultiStepLR", steps=30, warmup=w,
                    milestones=(8, 16), gamma=0.5)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_exponential_after_warmup_matches_reference():
    w = 4
    ref = _ref_lrs("linear", "ExponentialLR", steps=25, warmup=w, gamma=0.97)
    ours = _our_lrs("linear", "ExponentialLR", steps=25, warmup=w, gamma=0.97)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cubic_exponential_ramp_shape():
    """Sanity: the reference's 'exponential' warmup is alpha^3, not 2^x - 1."""
    ours = _our_lrs("exponential", "constant", steps=10, warmup=10, lr=1.0)
    np.testing.assert_allclose(ours, [(i / 10) ** 3 for i in range(10)], rtol=1e-6)

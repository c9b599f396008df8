"""Optimizer parity: our RAdam chain vs the reference torch RAdam.

The reference trains both G and D with harana/optimizers/radam.py (the
LiyuanLucasLiu implementation) behind torch clip_grad_norm_ and StepLR
(train_fastsvc.py:737-776). scale_by_ref_radam reproduces that update rule
exactly (including its eps placement, which differs from optax.radam);
these tests pin the full chain (clip -> radam -> StepLR schedule)
step-for-step against torch.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import optax

from conftest import make_reference_importable
from svcc23_fastsvc_tpu.train.state import make_optimizer

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")


def _run_both(grads, p0, *, lr, eps, clip, step_size=10, gamma=0.5):
    from harana.optimizers.radam import RAdam

    pt = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = RAdam([pt], lr=lr, eps=eps)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.tensor(g.copy())
        if clip:
            torch.nn.utils.clip_grad_norm_([pt], clip)
        opt.step()
        sched.step()

    tx = make_optimizer(
        lr=lr, eps=eps, grad_norm=clip or 0.0,
        scheduler_step_size=step_size, scheduler_gamma=gamma,
    )
    pj = jnp.asarray(p0.copy())
    st = tx.init(pj)
    for g in grads:
        u, st = tx.update(jnp.asarray(g), st, pj)
        pj = optax.apply_updates(pj, u)
    return np.asarray(pj), pt.detach().numpy()


@pytest.mark.parametrize("clip", [0.0, 2.0])
def test_radam_chain_matches_torch(clip):
    """30 steps spanning the SGD-fallback region (rho_t < 5 for t <= 4) and
    the rectified region, with grad magnitudes over 5 decades."""
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(64).astype(np.float32)
    grads = [
        (rng.standard_normal(64) * 10 ** rng.uniform(-4, 1)).astype(np.float32)
        for _ in range(30)
    ]
    got, want = _run_both(grads, p0, lr=1e-3, eps=1e-6, clip=clip)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_radam_sched_decay_applied_per_step():
    """StepLR decays at optimizer-step granularity; 25 steps cross two
    decay boundaries (step_size=10)."""
    rng = np.random.default_rng(1)
    p0 = rng.standard_normal(16).astype(np.float32)
    grads = [rng.standard_normal(16).astype(np.float32) for _ in range(25)]
    got, want = _run_both(grads, p0, lr=1e-2, eps=1e-6, clip=0.0,
                          step_size=10, gamma=0.5)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)

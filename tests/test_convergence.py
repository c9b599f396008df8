"""Convergence parity (short prefix): the reference torch Trainer and this
framework track each other step for step on identical batches.

The full experiment (400 steps through both GAN phases, committed as
CONVERGENCE_r04.{json,md}) runs via tools/convergence_parity.py; this test
pins a 24-step prefix through BOTH phases in CI. Both sides start from the
same converted weights, consume the same precomputed batches (sine included,
noise_amp=0), and use the reference-exact RAdam chain, so per-step losses
must agree to f32-trajectory tolerance (divergence grows chaotically with
step count; 24 steps keeps the bound tight and the test fast).
"""

import sys

import numpy as np
import pytest

from conftest import make_reference_importable

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")

sys.path.insert(0, ".")


def test_short_prefix_tracks_reference():
    from tools import convergence_parity as cp

    steps, d_start = 24, 8
    batches = cp.make_batches(steps + 1, batch_size=2, n_frames=24, seed=3)
    gen, dis = cp.build_reference(seed=3)
    task = cp.build_jax_task()
    state = cp.init_jax_state_from_reference(task, gen, dis)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ref_series = cp.run_reference(
            batches, d_start=d_start, outdir=td, gen=gen, dis=dis,
            max_steps=steps + 1,
        )
    jax_series, state = cp.run_jax(
        batches, d_start=d_start, task=task, state=state
    )

    # step 0 is the reference trainer's no-op (steps=0 gates G); both sides
    # must record nothing there
    assert ref_series[0] == {} and jax_series[0] == {}

    checked = 0
    for i, (r, j) in enumerate(zip(ref_series, jax_series)):
        assert r.keys() == j.keys(), f"step {i}: phase mismatch"
        for k in r:
            rel = abs(r[k] - j[k]) / max(abs(r[k]), 1e-6)
            assert rel < 3e-2, f"step {i} {k}: ref {r[k]} vs jax {j[k]}"
            checked += 1
    assert checked > steps  # both phases actually produced losses

    # the GAN phase ran: D losses present after d_start
    assert "discriminator_loss" in ref_series[d_start + 1]

    # final generators stay interchangeable: mel-L1 between them is an
    # order of magnitude below each one's distance to the target
    final = cp.final_model_agreement(task, state, gen, batches)
    assert final["mel_l1_ref_vs_jax"] < 0.2 * final["mel_l1_ref_vs_target"]

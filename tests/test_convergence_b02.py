"""B02 convergence parity (short prefix): the reference torch train_b02
Trainer and this framework's B02TrainTask track each other step for step on
identical batches.

The full experiment (400 steps through both GAN phases, committed as
CONVERGENCE_B02_r04.json) runs via tools/convergence_parity_b02.py; this
test pins a short prefix through BOTH phases in CI. Both sides start from
the same converted weights, consume the same precomputed batches, disable
dropout (the trainer's only per-step noise), and pin the discriminator's
random window to start 0 by construction (all lengths ==
batch_max_frames + 1), so per-step losses must agree to f32-trajectory
tolerance. Reference hot loop: /root/reference/harana/bin/train_b02.py:162-260.
"""

import sys
import tempfile

import pytest

from conftest import make_reference_importable

HAS_REF = make_reference_importable()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference tree not present")

sys.path.insert(0, ".")


def test_b02_short_prefix_tracks_reference():
    from tools import convergence_parity_b02 as cp

    steps, d_start = 16, 6
    batches = cp.make_batches(steps + 1, batch_size=2, seed=7)
    gen, dis = cp.build_reference(seed=7)
    task = cp.build_jax_task()
    state = cp.init_jax_state_from_reference(task, gen, dis)

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

    # the GAN phase ran: D losses present after d_start, and the reference's
    # detached-adversarial quirk is reflected in the logged generator loss
    assert "discriminator_loss" in ref_series[d_start + 1]
    assert "adversarial_loss" in jax_series[d_start + 1]

    # final generators interchangeable: teacher-forced feature L1 between
    # them is far below each one's distance to the target
    final = cp.final_model_agreement(task, state, gen, batches)
    assert final["feat_l1_ref_vs_jax"] < 0.05 * final["feat_l1_ref_vs_target"]
    # trained weights stay numerically together; the bound is loose
    # because the max is over per-leaf RELATIVE drift and some leaves
    # have near-zero scale after 16 tiny-batch steps
    assert final["final_param_max_rel_drift"] < 5e-3
    # bn running stats too: gan_step chains the BN update twice per GAN
    # step to replicate the reference's forward + regenerate-for-D
    # double update (train/b02.py), so the stats must track as well
    assert final["final_bn_running_stat_max_rel_drift"] < 5e-3

"""Packed wire on the B02 trainer: bf16 ppg only, exact under bf16 compute.

The B02 taco2 batch has no "audio" key and its lft/lf0 are already frame
rate, so WirePacker touches only ppg (f32 -> bf16). The B02 step casts
ppg to the compute dtype before first use (train/b02.py _cast), so with
compute_dtype=bfloat16 the packed batch is bit-equivalent — no unpack
needed in the B02 task at all. This halves the dominant transfer (ppg is
~80% of the taco2 batch bytes at production dims).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svcc23_fastsvc_tpu.data.wire import WirePacker
from svcc23_fastsvc_tpu.models.tacotron2 import (
    MultiSubFreqDiscriminator,
    Tacotron2,
)
from svcc23_fastsvc_tpu.train.b02 import B02TrainTask
from svcc23_fastsvc_tpu.train.state import make_optimizer


def test_b02_packed_wire_matches_f32():
    task = B02TrainTask(
        generator=Tacotron2(
            input_dim=12, output_dim=60, hidden_dim=16, econv_chans=8,
            prenet_dim=8, spk_emb_dim=8, dec_dropout_rate=0.0,
            prenet_dropout_rate=0.5,
        ),
        discriminator=MultiSubFreqDiscriminator(batch_max_frames=10),
        g_tx=make_optimizer(lr=1e-3, grad_norm=1.0),
        d_tx=make_optimizer(lr=1e-3, grad_norm=0.1),
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch = {
        "ppg": rng.standard_normal((2, 20, 12)).astype(np.float32),
        "lft": (0.1 * rng.standard_normal((2, 20, 1))).astype(np.float32),
        "lf0": (0.1 * rng.standard_normal((2, 20, 1)) + 5).astype(np.float32),
        "spk_emb": rng.standard_normal((2, 8)).astype(np.float32),
        "targets": (0.5 * rng.standard_normal((2, 20, 63))).astype(np.float32),
        "lengths": np.asarray([20, 14], np.int32),
    }
    packed = WirePacker(hop_size=160)(batch)
    assert packed["ppg"].dtype != np.float32  # bf16 on the wire
    # no audio key: lft/targets must be untouched
    assert packed["lft"].dtype == np.float32
    assert packed["targets"].dtype == np.float32

    def run(b):
        state = task.init_state(jax.random.PRNGKey(0))
        _, m = jax.jit(task.gan_step)(state, jax.tree.map(jnp.asarray, b))
        return {k: float(v) for k, v in m.items()}

    m_raw, m_packed = run(batch), run(packed)
    assert m_raw.keys() == m_packed.keys()
    for k in m_raw:
        assert m_raw[k] == pytest.approx(m_packed[k], rel=1e-5, abs=1e-6), k

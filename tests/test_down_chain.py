"""Parity of the fused DownsampleBlock chain kernel (interpret mode) vs
the production XLA block (ops/pallas_down_chain.py; reference
harana/models/fastsvc.py:143-193)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svcc23_fastsvc_tpu.models.fastsvc import DownsampleBlock
from svcc23_fastsvc_tpu.ops import fold_weight_norm
from svcc23_fastsvc_tpu.ops.pallas_down_chain import down_chain_fwd


@pytest.mark.parametrize("cin,c,T", [(1, 24, 1600), (24, 48, 960),
                                     (48, 96, 544)])
def test_down_chain_matches_block(cin, c, T):
    blk = DownsampleBlock(cin, c, scale=1, use_weight_norm=True)
    params = fold_weight_norm(blk.init(jax.random.PRNGKey(0)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, cin))

    # scale=1: block.apply is exactly the conv chain (no downsample)
    y_ref = np.asarray(blk.apply(params, x))
    y_fus = np.asarray(down_chain_fwd(x, params, tile_target=256))
    np.testing.assert_allclose(y_ref, y_fus, rtol=2e-4, atol=2e-4)


def test_down_chain_bf16():
    blk = DownsampleBlock(24, 48, scale=1, use_weight_norm=True)
    params = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16),
        fold_weight_norm(blk.init(jax.random.PRNGKey(0))),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 960, 24)).astype(
        jnp.bfloat16)
    y_ref = np.asarray(blk.apply(params, x), np.float32)
    y_fus = np.asarray(down_chain_fwd(x, params, tile_target=256),
                       np.float32)
    np.testing.assert_allclose(y_ref, y_fus, rtol=3e-2, atol=3e-2)


def test_down_chain_guards():
    blk = DownsampleBlock(1, 24, scale=1, use_weight_norm=False)
    params = blk.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        down_chain_fwd(jnp.zeros((1, 100, 1)), params)  # T % 32
    with pytest.raises(ValueError):
        down_chain_fwd(jnp.zeros((1, 64, 1)), params)  # T < 2H

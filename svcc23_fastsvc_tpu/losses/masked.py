"""Masked losses for variable-length (padded) sequence batches.

Reference: /root/reference/harana/losses/mse_loss.py — MSE over non-pad
positions only. Here the mask is built from lengths with static shapes
(broadcasted iota), so it jits cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lengths, max_len: int):
    """(B,) lengths -> (B, max_len) boolean non-pad mask."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def masked_mse_loss(x, y, lengths):
    """Mean squared error over valid frames of (B, T, D) sequences.

    Truncates to the shorter of x/y along T like the reference
    (mse_loss.py:25-31), masks padding, and averages over valid elements.
    """
    T = min(x.shape[1], y.shape[1])
    x, y = x[:, :T], y[:, :T]
    mask = length_mask(jnp.minimum(lengths, T), T)[..., None]
    sq = jnp.square(x - y) * mask
    denom = jnp.sum(mask) * x.shape[-1]
    return jnp.sum(sq) / jnp.maximum(denom, 1)

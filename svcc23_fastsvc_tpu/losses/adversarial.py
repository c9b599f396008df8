"""LSGAN / hinge adversarial losses over nested discriminator outputs.

Reference: /root/reference/harana/losses/adversarial_loss.py. Discriminator
outputs may be a flat list of logits tensors (HiFiGAN) or a list of
per-layer lists (MelGAN) — in the nested case the last element (final-layer
logits) is used, matching the reference's `outputs_[-1]` convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def _final_logits(outputs):
    if isinstance(outputs, (list, tuple)):
        return [o[-1] if isinstance(o, (list, tuple)) else o for o in outputs]
    return [outputs]


def generator_adversarial_loss(outputs, *, loss_type: str = "mse",
                               average_by_discriminators: bool = True):
    logits = _final_logits(outputs)
    total = 0.0
    for o in logits:
        if loss_type == "mse":
            total += jnp.mean(jnp.square(o - 1.0))
        elif loss_type == "hinge":
            total += -jnp.mean(o)
        else:
            raise ValueError(loss_type)
    if average_by_discriminators:
        total /= len(logits)
    return total


def discriminator_adversarial_loss(outputs_hat, outputs, *, loss_type: str = "mse",
                                   average_by_discriminators: bool = True):
    """Returns (real_loss, fake_loss)."""
    fake = _final_logits(outputs_hat)
    real = _final_logits(outputs)
    real_loss, fake_loss = 0.0, 0.0
    for o_hat, o in zip(fake, real):
        if loss_type == "mse":
            real_loss += jnp.mean(jnp.square(o - 1.0))
            fake_loss += jnp.mean(jnp.square(o_hat))
        elif loss_type == "hinge":
            real_loss += -jnp.mean(jnp.minimum(o - 1.0, 0.0))
            fake_loss += -jnp.mean(jnp.minimum(-o_hat - 1.0, 0.0))
        else:
            raise ValueError(loss_type)
    if average_by_discriminators:
        real_loss /= len(real)
        fake_loss /= len(fake)
    return real_loss, fake_loss


def feature_matching_loss(fmaps_hat, fmaps):
    """L1 over discriminator feature maps (HiFiGAN-style auxiliary)."""
    total = 0.0
    for f_hat, f in zip(fmaps_hat, fmaps):
        total += jnp.mean(jnp.abs(f_hat - f))
    return total / max(len(fmaps), 1)

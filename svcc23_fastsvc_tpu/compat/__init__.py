"""Interop with reference (PyTorch) checkpoints."""

from .torch_weights import (  # noqa: F401
    convert_fastsvc_generator,
    convert_melgan_msd,
    convert_hifigan_msd_mpd,
    convert_tacotron2,
    convert_subfreq_discriminator,
    convert_hnusfgan,
)

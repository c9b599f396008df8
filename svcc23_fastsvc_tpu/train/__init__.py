"""Training engine: optimizers, GAN train step, state, checkpointing."""

from .state import GANTrainState, make_optimizer  # noqa: F401
from .gan import FastSVCTrainTask  # noqa: F401

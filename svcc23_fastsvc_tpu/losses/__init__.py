"""Training losses."""

from .stft_loss import MultiResolutionSTFTLoss, stft_loss  # noqa: F401
from .adversarial import (  # noqa: F401
    generator_adversarial_loss,
    discriminator_adversarial_loss,
    feature_matching_loss,
)
from .masked import masked_mse_loss  # noqa: F401

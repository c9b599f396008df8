"""DSP / feature extraction layer."""

from .f0 import yin_f0, F0Statistics, dilated_factor  # noqa: F401

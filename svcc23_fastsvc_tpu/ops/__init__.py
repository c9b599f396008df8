"""Core TPU-friendly ops shared by models, losses, and feature extraction."""

from .conv import (  # noqa: F401
    conv1d,
    conv2d,
    conv1d_init,
    conv2d_init,
    conv_weight,
    wn_init,
    wn_weight,
    fold_weight_norm,
    leaky_relu,
    instance_norm,
    avg_pool1d,
    reflect_pad1d,
    l2_normalize,
    linear,
    linear_init,
)
from .resample import (  # noqa: F401
    nearest_resize,
    nearest_upsample,
    nearest_downsample,
)
from .stft import (  # noqa: F401
    hann_window,
    frame_signal,
    stft,
    stft_magnitude,
    mel_filterbank,
    fft_frequencies,
    a_weighting_db,
    power_to_db,
    db_to_amplitude,
    loudness_extract,
)
from .signal_gen import SignalGenerator  # noqa: F401

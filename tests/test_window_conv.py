"""Window-conv lowering (ops/pallas_window_conv.py): fwd + full VJP parity
against the taps-einsum production lowering, in interpret mode on CPU.

The kernel's contract: same-padding stride-1 K-tap conv with optional fused
input leaky_relu, x streamed once through a VMEM halo window (no (B,T,K*C)
tap operand). dw/db accumulate in f32 across the sequential grid.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svcc23_fastsvc_tpu.ops import conv as C


@pytest.fixture(autouse=True)
def _force_window_mode():
    C.set_window_conv_mode("1")
    yield
    C.set_window_conv_mode("0")


CASES = [
    # B, T, Cin, Cout, dil, slope, dtype
    (2, 700, 24, 24, 3, 0.2, jnp.float32),     # production C24 class
    (1, 130, 8, 16, 27, None, jnp.float32),    # dilation ~ T/4, edge-heavy
    (2, 512, 48, 48, 9, 0.2, jnp.bfloat16),    # bf16 training class
    (1, 33, 4, 4, 1, 0.2, jnp.float32),        # tiny T, partial tiles
    (2, 96, 128, 128, 1, None, jnp.float32),   # channel gate boundary
]


@pytest.mark.parametrize("B,T,Cin,Cout,dil,slope,dt", CASES)
def test_window_conv_fwd_and_vjp_match_taps_einsum(B, T, Cin, Cout, dil,
                                                   slope, dt):
    K, lo = 3, dil
    kx, kw, kb, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(kx, (B, T, Cin), jnp.float32).astype(dt)
    w = (jax.random.normal(kw, (K, Cin, Cout), jnp.float32) * 0.3).astype(dt)
    b = jax.random.normal(kb, (Cout,), jnp.float32).astype(dt)
    gy = jax.random.normal(kg, (B, T, Cout), jnp.float32).astype(dt)

    def ref(x, w, b):
        h = C.leaky_relu(x, slope) if slope is not None else x
        return C._conv1d_taps_einsum(h, w, b, lo, lo, dil)

    def fused(x, w, b):
        return C.window_conv1d(x, w, b, lo, dil, slope)

    def run(f):
        out, vjp = jax.vjp(f, x, w, b)
        return (out, *vjp(gy.astype(out.dtype)))

    want = run(ref)
    got = run(fused)
    # tolerance relative to each tensor's own scale: bf16 differs by input
    # rounding (leaky computed f32-then-cast vs bf16), ~0.5% of scale
    rel = 6e-3 if dt == jnp.bfloat16 else 1e-5
    for name, a, g_ in zip(("y", "dx", "dw", "db"), want, got):
        a = np.asarray(a, np.float32)
        g_ = np.asarray(g_, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            g_, a, rtol=0, atol=rel * scale,
            err_msg=f"{name} ({B},{T},{Cin},{Cout},d{dil})",
        )


def test_window_conv_no_bias():
    K, dil, lo = 3, 3, 3
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (2, 200, 16))
    w = jax.random.normal(kw, (K, 16, 16)) * 0.3
    gy = jax.random.normal(kg, (2, 200, 16))

    def ref(x, w):
        return C._conv1d_taps_einsum(x, w, None, lo, lo, dil)

    def fused(x, w):
        return C.window_conv1d(x, w, None, lo, dil, None)

    for f in (ref, fused):
        out, vjp = jax.vjp(f, x, w)
        if f is ref:
            want = (out, *vjp(gy))
        else:
            got = (out, *vjp(gy))
    for a, g_ in zip(want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_conv1d_dispatch_uses_window_path():
    """conv1d routes eligible convs to the window lowering when enabled,
    and the result matches the disabled path."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 160, 24))
    w = jax.random.normal(kw, (3, 24, 24)) * 0.3
    y_on = C.conv1d(x, w, None, padding=3, dilation=3, input_leaky=0.2)
    C.set_window_conv_mode("0")
    y_off = C.conv1d(x, w, None, padding=3, dilation=3, input_leaky=0.2)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-5, atol=1e-6)


def test_supported_gate():
    from svcc23_fastsvc_tpu.ops.pallas_window_conv import (
        window_conv1d_supported,
    )

    ok = dict(stride=1, groups=1, lo=3, hi=3, dilation=3)
    assert window_conv1d_supported((2, 100, 24), (3, 24, 24), **ok)
    assert not window_conv1d_supported(
        (2, 100, 24), (3, 24, 24), stride=2, groups=1, lo=3, hi=3, dilation=3
    )
    assert not window_conv1d_supported(  # asymmetric pad
        (2, 100, 24), (3, 24, 24), stride=1, groups=1, lo=3, hi=2, dilation=3
    )
    assert not window_conv1d_supported(  # not same-padding
        (2, 100, 24), (3, 24, 24), stride=1, groups=1, lo=1, hi=1, dilation=3
    )
    assert not window_conv1d_supported(  # channels over the lane gate
        (2, 100, 192), (3, 192, 192), stride=1, groups=1, lo=3, hi=3,
        dilation=3,
    )
    assert not window_conv1d_supported(  # even K
        (2, 100, 24), (4, 24, 24), stride=1, groups=1, lo=3, hi=3, dilation=2
    )

"""Convolution / normalization primitives in channels-last layout.

All tensors are (B, T, C) ["NWC"] so that the channel dimension lands on the
TPU lane dimension (128) and convs lower to MXU matmuls. Weights are stored
in WIO layout (kernel, in_ch/groups, out_ch).

Semantics match the torch layers used by the reference
(`/root/reference/harana/layers/upsample.py:76-106`,
`/root/reference/harana/models/fastsvc.py`) so converted checkpoints are
numerically comparable, but the implementation is JAX-native.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# Below this channel count, 1-D convs are lowered as a shifted-slice einsum
# instead of lax.conv: XLA's conv path measured 5.5-8.3 TFLOP/s bf16 on the
# generator's hot C=24 x T=24000 dilated shapes on a v5e, while the explicit
# tap-stack einsum hit 13.4-16.9 (tools/bench_conv_variants.py). At C>=48
# the conv path wins (22-28 TFLOP/s), so the dispatch is shape-based.
_EINSUM_LOWERING_MAX_CHANNELS = 32


def _conv1d_taps_einsum(x, weight, pad_lo, pad_hi, dilation):
    """Stride-1 ungrouped conv as K shifted slices + one (K*C_in) matmul.

    Same cross-correlation semantics as lax.conv_general_dilated; the slice
    adjoints are pad+add, so the backward stays matmul-shaped too.
    """
    K, C_in, C_out = weight.shape
    T = x.shape[1]
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)))
    t_out = T + pad_lo + pad_hi - (K - 1) * dilation
    # concat on the channel axis (not a new tap axis): the operand stays a
    # 3-D (B, T, K*C) tensor with one unambiguous K*C-lane layout — a
    # (B, T, K, C) stack gave XLA a split minor pair it kept re-laying out
    taps = jnp.concatenate(
        [xp[:, k * dilation : k * dilation + t_out] for k in range(K)],
        axis=-1,
    )  # (B, T_out, K*C_in)
    return taps @ weight.reshape(K * C_in, C_out)


def _conv1d_stride_folded(x, weight, lo, hi, stride, groups):
    """Strided conv with the stride folded into the channel dimension.

    The MelGAN/HiFiGAN downsample layers are K~41, stride-4 convs with
    4-channel groups; XLA lays the grouped operands out as (..., g, ci_g)
    with ci_g=4 on the 128-lane dim, so every memory tile is ~97% padding —
    profiled at 26-84 GiB/s effective HBM bandwidth and dominating the
    discriminator's cost. Reshaping `stride` consecutive samples into
    channels turns this into a stride-1 conv with per-group width
    stride*ci_g at identical FLOPs (fold == stride, kernel padded
    K -> ceil-multiple only), recovering stride x the lane fill for both
    the forward and the autodiff transpose convs.
    """
    B, T, C_in = x.shape
    K, in_pg, C_out = weight.shape
    s, g = stride, groups
    t_out = (T + lo + hi - K) // s + 1
    n_l = -(-lo // s)
    extra_left = n_l * s - lo
    kp = -(-(K + extra_left) // s)
    left = n_l * s
    L = s * (t_out + kp - 1)
    right = L - T - left
    if right < 0:  # degenerate tiny-T case: not worth folding
        return None
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    xf = (
        xp.reshape(B, L // s, s, g, in_pg)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, L // s, g * s * in_pg)
    )
    wf = jnp.pad(
        weight, ((extra_left, kp * s - K - extra_left), (0, 0), (0, 0))
    ).reshape(kp, s * in_pg, C_out)
    return jax.lax.conv_general_dilated(
        xf,
        wf,
        window_strides=(1,),
        padding=((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=g,
    )


def conv1d(
    x,
    weight,
    bias=None,
    *,
    stride: int = 1,
    padding=0,
    dilation: int = 1,
    groups: int = 1,
):
    """1-D convolution on (B, T, C_in) with WIO weight (K, C_in/groups, C_out).

    `padding` is an int (symmetric zero pad), a (lo, hi) tuple, or "VALID".
    Matches torch.nn.Conv1d numerics for the same hyperparameters.
    """
    if padding == "VALID":
        lo, hi = 0, 0
    elif isinstance(padding, int):
        lo, hi = padding, padding
    else:
        lo, hi = padding
    K, in_pg, C_out = weight.shape
    out = None
    # NB: widening this to cover C_in 24 -> C_out 48 shapes was tried twice
    # (both tap-operand layouts) and regressed the training backward ~7%;
    # the square <=32-channel gate is the measured optimum.
    if (
        stride == 1
        and groups == 1
        and 2 <= K <= 5
        and max(in_pg, C_out) <= _EINSUM_LOWERING_MAX_CHANNELS
    ):
        out = _conv1d_taps_einsum(x, weight, lo, hi, dilation)
    elif stride > 1 and dilation == 1 and K > stride and in_pg <= 32:
        out = _conv1d_stride_folded(x, weight, lo, hi, stride, groups)
    if out is None:
        out = jax.lax.conv_general_dilated(
            x,
            weight,
            window_strides=(stride,),
            padding=((lo, hi),),
            rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=groups,
        )
    if bias is not None:
        out = out + bias
    return out


def conv2d(
    x,
    weight,
    bias=None,
    *,
    stride=(1, 1),
    padding=((0, 0), (0, 0)),
    dilation=(1, 1),
    groups: int = 1,
):
    """2-D convolution on (B, H, W, C_in) with HWIO weight."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    else:
        padding = tuple(
            (p, p) if isinstance(p, int) else tuple(p) for p in padding
        )
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=tuple(stride),
        padding=padding,
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


def _fan_in(kernel_size: int, in_per_group: int) -> int:
    return kernel_size * in_per_group


def conv1d_init(
    key,
    kernel_size: int,
    in_channels: int,
    out_channels: int,
    *,
    groups: int = 1,
    bias: bool = True,
    dtype=jnp.float32,
):
    """Kaiming-uniform init matching torch.nn.Conv1d defaults.

    Returns {"w": (K, C_in/groups, C_out)[, "b": (C_out,)]}.
    """
    in_pg = in_channels // groups
    fan_in = _fan_in(kernel_size, in_pg)
    bound_w = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    params = {
        "w": jax.random.uniform(
            kw, (kernel_size, in_pg, out_channels), dtype, -bound_w, bound_w
        )
    }
    if bias:
        bound_b = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(
            kb, (out_channels,), dtype, -bound_b, bound_b
        )
    return params


def conv2d_init(
    key,
    kernel_size,
    in_channels: int,
    out_channels: int,
    *,
    groups: int = 1,
    bias: bool = True,
    dtype=jnp.float32,
):
    """Kaiming-uniform init matching torch.nn.Conv2d defaults (HWIO weight)."""
    kh, kw_ = kernel_size
    in_pg = in_channels // groups
    fan_in = kh * kw_ * in_pg
    bound_w = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    params = {
        "w": jax.random.uniform(
            kw, (kh, kw_, in_pg, out_channels), dtype, -bound_w, bound_w
        )
    }
    if bias:
        bound_b = 1.0 / math.sqrt(fan_in)
        params["b"] = jax.random.uniform(
            kb, (out_channels,), dtype, -bound_b, bound_b
        )
    return params


# ---------------------------------------------------------------------------
# Weight normalization.
#
# The reference applies torch weight_norm (dim=0 over the torch (O, I, K)
# weight) to every generator/discriminator conv
# (/root/reference/harana/models/fastsvc.py:354-362). In WIO layout that is a
# per-output-channel norm over the (K, I) axes. We store {"v", "g"} and
# reconstruct w inside the training step; `fold_weight_norm` bakes w in for
# inference (the reference's remove_weight_norm).
# ---------------------------------------------------------------------------


def wn_init(conv_params):
    """Reparameterize a {"w"[, "b"]} conv param dict into weight-norm form."""
    w = conv_params["w"]
    axes = tuple(range(w.ndim - 1))  # all but the output-channel axis
    g = jnp.sqrt(jnp.sum(jnp.square(w), axis=axes))
    out = {"v": w, "g": g}
    if "b" in conv_params:
        out["b"] = conv_params["b"]
    return out


def wn_weight(params):
    """Compute the effective weight from weight-norm params {"v", "g"}."""
    v = params["v"]
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return params["g"] * v / norm


def _is_wn_leaf(d) -> bool:
    return isinstance(d, dict) and "v" in d and "g" in d


def fold_weight_norm(params):
    """Recursively fold {"v","g"} weight-norm params into plain {"w"} params."""
    if _is_wn_leaf(params):
        out = {"w": wn_weight(params)}
        if "b" in params:
            out["b"] = params["b"]
        return out
    if isinstance(params, dict):
        return {k: fold_weight_norm(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fold_weight_norm(v) for v in params)
    return params


def conv_weight(params):
    """Effective weight for either plain {"w"} or weight-norm {"v","g"}."""
    if "w" in params:
        return params["w"]
    return wn_weight(params)


# ---------------------------------------------------------------------------
# Misc layers.
# ---------------------------------------------------------------------------


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def instance_norm(x, *, eps: float = 1e-5, axis=1):
    """InstanceNorm without affine params over the time axis of (B, T, C).

    Matches torch.nn.InstanceNorm2d(affine=False) on a (B, C, 1, T) tensor
    (reference fastsvc.py:76,138): per-(batch, channel) mean/var over time,
    biased variance, eps inside the sqrt.
    """
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def avg_pool1d(
    x, kernel_size: int, stride: int, padding: int = 0, count_include_pad=True
):
    """AvgPool1d on (B, T, C) matching torch.nn.AvgPool1d semantics.

    torch computes out_len = floor((T + 2*pad - k)/stride) + 1 and, with
    count_include_pad=False, divides each window by the number of non-pad
    elements in it.
    """
    T = x.shape[1]
    out_len = (T + 2 * padding - kernel_size) // stride + 1
    # Trim any input that can never be touched so reduce_window's full-window
    # semantics agree with torch's floor division.
    needed = (out_len - 1) * stride + kernel_size
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    xp = xp[:, :needed]
    summed = jax.lax.reduce_window(
        xp,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )
    if count_include_pad or padding == 0:
        return summed / kernel_size
    ones = jnp.ones((1, T, 1), dtype=x.dtype)
    ones = jnp.pad(ones, ((0, 0), (padding, padding), (0, 0)))[:, :needed]
    counts = jax.lax.reduce_window(
        ones,
        0.0,
        jax.lax.add,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding="VALID",
    )
    return summed / counts


def reflect_pad1d(x, pad):
    """Reflection padding on the time axis of (B, T, C)."""
    if isinstance(pad, int):
        pad = (pad, pad)
    return jnp.pad(x, ((0, 0), tuple(pad), (0, 0)), mode="reflect")


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def linear_init(key, in_features: int, out_features: int, *, bias=True, dtype=jnp.float32):
    """torch.nn.Linear default init; weight stored as (in, out)."""
    bound = 1.0 / math.sqrt(in_features)
    kw, kb = jax.random.split(key)
    params = {
        "w": jax.random.uniform(
            kw, (in_features, out_features), dtype, -bound, bound
        )
    }
    if bias:
        params["b"] = jax.random.uniform(kb, (out_features,), dtype, -bound, bound)
    return params


def linear(x, params):
    out = x @ params["w"]
    if "b" in params:
        out = out + params["b"]
    return out

"""Foundational NHWC layers built directly on lax convolutions.

These replace torch ``nn.Conv2d / nn.ConvTranspose2d / nn.Linear /
nn.LayerNorm`` with TPU-native NHWC equivalents.  Writing them on
``lax.conv_general_dilated`` (instead of flax's Conv) gives exact control of
padding semantics (torch pads ``k//2``), grouped/depthwise convs, and
torch-default initialization statistics.

Mixed precision: parameters are stored in ``param_dtype`` (f32) and cast to
``dtype`` (bf16 on TPU) at use — XLA fuses the casts into the convolutions.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from .init import make_torch_bias_init, torch_kernel_init

Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _depthwise_shift_mac(x, kernel, ksize, padding, dtype):
    """Depthwise (channel-multiplier-1) conv as kh*kw shifted multiply-adds.

    Used for the stride-1 3x3 depthwise convs that every model runs
    (reference SpectralTransformer.py:82 etc.).  Two reasons over
    ``lax.conv_general_dilated(feature_group_count=C)``:

    - XLA's grouped-conv GRADIENT blows up: the filter-grad conv of a
      C-group conv is counted (and on some backends computed) densely —
      cost_analysis shows fwd+bwd = ~40x fwd for the lax lowering, vs ~3x
      for this formulation, whose autodiff is just shifted elementwise ops.
    - A depthwise conv has no useful contraction for the MXU anyway
      (I=1); kh*kw fused VPU FMAs over one padded array is the natural
      TPU lowering and XLA fuses the accumulation chain.

    Accumulates in f32 when computing in bf16 (like the MXU conv path
    would), then casts back.  ``UIRT_DWCONV_LAX=1`` restores the lax path
    for A/B comparison.
    """
    kh, kw = ksize
    ph, pw = padding
    _, h, w, _ = x.shape
    acc_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype
    xp = jnp.pad(x.astype(dtype), ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    k = kernel.astype(dtype)  # (kh, kw, 1, C)
    y = None
    for dh in range(kh):
        for dw in range(kw):
            term = (xp[:, dh:dh + h, dw:dw + w, :] * k[dh, dw, 0]).astype(
                acc_dtype)
            y = term if y is None else y + term
    # tag the output so remat_policy="mxu+ew" can save it: unlike the lax
    # path this lowering emits no conv primitive, so the plain "mxu"
    # policy recomputes all kh*kw shifted FMAs in the backward
    return checkpoint_name(y.astype(dtype), "dwconv_out")


def _dw_conv(x, k, padding):
    """Plain stride-1 depthwise lax conv, NHWC/HWIO, C groups."""
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


def _depthwise_shift_mac_nchw(x, kernel, ksize, padding, dtype):
    """Channel-major twin of ``_depthwise_shift_mac``: x is (B, C, H, W),
    kernel stays (kh, kw, 1, C).  Shifts run over the two MINOR dims, so on
    TPU the reads stream unpadded bytes when W is lane-sized — the point of
    the channels-first block layout (see Conv2d.data_format)."""
    kh, kw = ksize
    ph, pw = padding
    _, _, h, w = x.shape
    acc_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype
    xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    k = kernel.astype(dtype)  # (kh, kw, 1, C)
    y = None
    for dh in range(kh):
        for dw in range(kw):
            tap = k[dh, dw, 0][None, :, None, None]  # broadcast over (H, W)
            term = (xp[:, :, dh:dh + h, dw:dw + w] * tap).astype(acc_dtype)
            y = term if y is None else y + term
    return checkpoint_name(y.astype(dtype), "dwconv_out")


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _depthwise_conv_hybrid(x, k, meta):
    """Depthwise stride-1 'same' conv with a hand-written VJP.

    Motivation (measured, PERF_NOTES.md round 2): XLA-TPU computes the
    grouped-conv FILTER gradient densely — a Spectral@256 bs64 train step
    on the pure-lax path runs at 24 img/s on a chip sustaining 111 bf16
    TFLOP/s on matmuls — while the shift-MAC forward lowering
    (`_depthwise_shift_mac`) fixes the flops but inflates peak HBM (its
    autodiff materializes kh*kw shifted copies; bs64 no longer fits).

    This path keeps the forward a SINGLE lax conv (one op, no shifted
    copies, bit-identical to the lax lowering) and replaces only the
    backward:

    - input grad = depthwise conv of dy with the spatially flipped kernel
      (the exact transpose of stride-1 symmetric-'same' correlation);
    - filter grad = kh*kw fused multiply-reduce taps
      (einsum ``bhwc,bhwc->c`` on shifted slices — XLA fuses each into a
      single reduction; nothing big is materialized).

    Restriction: ``jax.custom_vjp`` has no JVP rule, so forward-mode AD
    (``jax.jvp`` / ``jax.linearize`` / HVPs) through any model raises under
    ``UIRT_DWCONV=hybrid``.  Training is reverse-mode only, so this is
    harmless today; switch to ``shift`` or ``lax`` if a forward-mode
    consumer ever appears.
    """
    ph, pw = meta
    return _dw_conv(x, k, [(ph, ph), (pw, pw)])


def _depthwise_conv_hybrid_fwd(x, k, meta):
    return _depthwise_conv_hybrid(x, k, meta), (x, k)


def _depthwise_conv_hybrid_bwd(meta, res, dy):
    x, k = res
    kh, kw = k.shape[0], k.shape[1]
    ph, pw = meta
    _, h, w, _ = x.shape
    # transpose of symmetric-'same' stride-1 correlation: correlation of dy
    # with the spatially flipped kernel, same padding
    dx = _dw_conv(dy, k[::-1, ::-1], [(ph, ph), (pw, pw)])
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    taps = []
    for dh in range(kh):
        for dw in range(kw):
            taps.append(jnp.einsum(
                "bhwc,bhwc->c", xp[:, dh:dh + h, dw:dw + w, :], dy,
                preferred_element_type=jnp.float32))
    dk = jnp.stack(taps).reshape(kh, kw, 1, x.shape[-1]).astype(k.dtype)
    return dx, dk


_depthwise_conv_hybrid.defvjp(_depthwise_conv_hybrid_fwd,
                              _depthwise_conv_hybrid_bwd)


_DWCONV_MODES = ("shift", "lax", "hybrid")


def _dwconv_mode() -> str:
    """Depthwise lowering selector: UIRT_DWCONV in {shift, lax, hybrid}
    (UIRT_DWCONV_LAX=1 is the historical alias for lax).

    Default is ``lax`` — the honest-timing A/B (round 3, value-fetch
    harness; PERF_NOTES.md) measured Spectral@256 bs16 K=2 at lax 20.7 /
    hybrid 18.5 / shift 11.8 img/s: the ~40x dense filter-grad flop count
    that motivated ``shift`` was a cost_analysis artifact, not a hardware
    cost.  ``shift``/``hybrid`` remain for A/B and HBM-shape comparisons.

    An unrecognized value raises: a typo silently falling back to the
    default would corrupt env-driven A/B measurements."""
    if os.environ.get("UIRT_DWCONV_LAX"):
        return "lax"
    mode = os.environ.get("UIRT_DWCONV", "lax")
    if mode not in _DWCONV_MODES:
        raise ValueError(
            f"UIRT_DWCONV={mode!r} — expected one of {_DWCONV_MODES}")
    return mode


class Conv2d(nn.Module):
    """NHWC conv matching torch Conv2d semantics (torch pads ``padding`` on
    both sides; groups via feature_group_count).

    Mirrors reference usage such as ``nn.Conv2d(c, c, 3, padding=1, groups=c)``
    (depthwise, e.g. reference SpectralTransformer.py:82) and the 1x1
    projections used throughout.

    ``data_format="NCHW"`` runs the conv channels-first with IDENTICAL
    parameter shapes/names: 1x1 convs lower as a channel einsum, stride-1
    same-pad depthwise as the channel-major shift-MAC, anything else through
    lax with NCHW dimension numbers.  Used by the channels-first block
    layout of the Spectral full-res levels, where NHWC's C<128 lane padding
    makes every elementwise intermediate stream up to 8x its logical bytes
    (PERF_NOTES.md round 3 — the full-res blocks are ~77% of the step).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int], str] = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = torch_kernel_init
    data_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        cf = self.data_format == "NCHW"
        in_ch = x.shape[1] if cf else x.shape[-1]
        assert in_ch % self.groups == 0 and self.features % self.groups == 0
        kshape = (kh, kw, in_ch // self.groups, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, self.param_dtype)
        if self.padding == "same" or self.padding == "SAME":
            pad = "SAME"
        else:
            ph, pw = _pair(self.padding)
            pad = [(ph, ph), (pw, pw)]
        mode = _dwconv_mode()
        is_dw_same = (
            self.groups == in_ch == self.features and self.groups > 1
            and (sh, sw) == (1, 1) and not isinstance(pad, str)
            and 2 * pad[0][0] == kh - 1 and 2 * pad[1][0] == kw - 1
            and kh * kw <= 9)
        if cf:
            xd, kd = x.astype(self.dtype), kernel.astype(self.dtype)
            if (kh, kw) == (1, 1) and self.groups == 1 and (sh, sw) == (1, 1):
                y = jnp.einsum("bchw,co->bohw", xd, kd[0, 0],
                               preferred_element_type=jnp.float32
                               ).astype(self.dtype)
            elif is_dw_same and mode != "lax":
                # hybrid's custom VJP is NHWC-only; shift-MAC autodiff is
                # already linear-cost, so both non-lax modes share it here
                y = _depthwise_shift_mac_nchw(x, kernel, (kh, kw), (ph, pw),
                                              self.dtype)
            else:
                y = lax.conv_general_dilated(
                    xd, kd, window_strides=(sh, sw), padding=pad,
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                    feature_group_count=self.groups,
                )
        elif is_dw_same and mode != "lax":
            # same-padding only: the slice windows assume the padded map is
            # exactly (H+kh-1, W+kw-1)
            if mode == "hybrid":
                y = _depthwise_conv_hybrid(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    (ph, pw))
            else:
                y = _depthwise_shift_mac(x, kernel, (kh, kw), (ph, pw),
                                         self.dtype)
        else:
            y = lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(sh, sw),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            fan_in = (in_ch // self.groups) * kh * kw
            bias = self.param(
                "bias", make_torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
            b = bias.astype(self.dtype)
            y = y + (b[None, :, None, None] if cf else b)
        return y


class ConvTranspose2d(nn.Module):
    """NHWC transposed conv; output size matches torch:
    ``(H-1)*s - 2p + k``.  (Used by AST's Upsample, reference AST.py:428-443.)
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    strides: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kshape = (kh, kw, in_ch, self.features)
        kernel = self.param("kernel", torch_kernel_init, kshape, self.param_dtype)
        y = lax.conv_transpose(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(sh, sw),
            padding=[(kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = in_ch * kh * kw
            bias = self.param(
                "bias", make_torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class Dense(nn.Module):
    """torch nn.Linear equivalent (torch-default init statistics)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = torch_kernel_init

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_f, self.features), self.param_dtype
        )
        y = jnp.matmul(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype
            if self.dtype == jnp.float32
            else jnp.float32,
        )
        y = y.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", make_torch_bias_init(in_f), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the channel dim (``axis``, default trailing), torch
    eps (1e-5), affine.

    Statistics are computed in f32 (torch semantics; bf16 mean/var over
    C=16 would lose ~2 decimal digits).  ``UIRT_LN_BF16=1`` keeps the whole
    op in the compute dtype as an on-hardware A/B pricing the f32
    round-trips at the lane-padded full-res levels — NOT parity-safe, never
    use with converted checkpoints or parity tests.

    ``axis=1`` serves the channels-first block layout (params and math are
    identical; only the reduction axis moves)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        dim = x.shape[self.axis]
        scale = self.param("scale", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        ct = self.dtype if os.environ.get("UIRT_LN_BF16") else jnp.float32
        xf = x.astype(ct)
        mean = jnp.mean(xf, axis=self.axis, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=self.axis, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + jnp.asarray(self.epsilon, ct))
        bshape = [1] * x.ndim
        bshape[self.axis] = dim
        y = (y * scale.astype(ct).reshape(bshape)
             + bias.astype(ct).reshape(bshape))
        return y.astype(self.dtype)


def gelu(x):
    """Exact (erf) GELU — torch nn.GELU default (reference model.py:19,
    AST.py uses nn.GELU too), so exact erf is the parity default.

    ``UIRT_FAST_GELU=1`` swaps in the tanh approximation (~1e-3 abs
    divergence) as an on-hardware A/B for the VPU cost of erf — never use
    it with converted checkpoints or parity tests.
    """
    if os.environ.get("UIRT_FAST_GELU"):
        y = jax.nn.gelu(x, approximate=True)
    else:
        y = jax.nn.gelu(x, approximate=False)
    # tagged so remat_policy="mxu+ew" can save it — erf is the most
    # expensive elementwise op in the step (see PERF_NOTES.md attribution)
    return checkpoint_name(y, "gelu_out")


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def _mxu_saveable(prim, *avals, **params) -> bool:
    """jax.checkpoint policy: save every MXU/FFT output, recompute only
    elementwise ops in the backward pass.

    Plain per-block remat recomputes the whole forward — measured +17.9%
    train-step flops on SpectralTransformer@256 (PERF_NOTES.md).  On a
    flop-bound chip that recompute is the most expensive part of the block;
    the *memory* win of remat comes mostly from not storing the swarm of
    fused elementwise intermediates (gelu/norm/complex temporaries), which
    are nearly free to recompute on the VPU.  Saving dot/conv/FFT outputs
    keeps the backward off the MXU while still dropping those temporaries.

    Complex-valued residuals must NOT be saved: jax's residual plumbing
    tags each saved value with ``lax.reduce_precision`` (ad_checkpoint.py
    _insert_reduce_precision, guarding on ``np.inexact`` which complex
    passes), and reduce_precision rejects complex dtypes — saving a
    complex64 FFT output is a TypeError at trace time in jax 0.9.  So
    complex FFTs are recomputed (VPU-ish cost, acceptable) and only the
    real-output inverse-real FFT is saved.
    """
    name = getattr(prim, "name", "")
    if name in ("dot_general", "conv_general_dilated"):
        return not any(
            jnp.issubdtype(getattr(a, "dtype", jnp.float32),
                           jnp.complexfloating) for a in avals)
    if name == "fft":
        return str(params.get("fft_type", "")).endswith("IRFFT")
    return False


# checkpoint_name tags whose outputs "mxu+ew" additionally saves: the
# shift-MAC depthwise (kh*kw VPU FMAs, no conv primitive to match) and
# exact-GELU (erf — the most expensive elementwise op in the attribution)
_SAVED_NAMES = ("dwconv_out", "gelu_out")


def _mxu_ew_saveable(prim, *avals, **params) -> bool:
    if getattr(prim, "name", "") == "name":
        return params.get("name") in _SAVED_NAMES
    return _mxu_saveable(prim, *avals, **params)


# Named activation-checkpoint policies for model ``remat_policy`` fields.
# None/"full": recompute everything (max HBM savings, +~18% flops);
# "mxu": save matmul/conv/FFT outputs, recompute elementwise only
# (near-zero extra MXU flops, intermediate HBM savings);
# "mxu+ew": "mxu" plus the tagged expensive elementwise outputs
# (shift-MAC depthwise, erf-GELU) — least recompute, most residual HBM;
# "dots": save only non-batch matmuls (weight matmuls), recompute
# attention matmuls/convs/FFTs (between the other two).
REMAT_POLICIES = {
    None: None,
    "full": None,
    "mxu": _mxu_saveable,
    "mxu+ew": _mxu_ew_saveable,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def make_remat(remat: bool, policy: Optional[str] = None):
    """Return the remat transform models wrap their blocks with.

    ``make_remat(False)`` is the identity; otherwise ``nn.remat`` with the
    named policy from ``REMAT_POLICIES`` (see there for the trade-offs).
    Works on both flax Module classes and plain functions, matching the
    two styles the model zoo uses.
    """
    if not remat:
        return lambda target: target
    if policy not in REMAT_POLICIES:
        raise ValueError(
            f"Unknown remat policy {policy!r}; one of {list(REMAT_POLICIES)}")
    pol = REMAT_POLICIES[policy]
    if pol is None:
        return nn.remat
    return lambda target: nn.remat(target, policy=pol)


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    """F.normalize(x, dim=axis): x / max(||x||_2, eps).

    Written as ``x / sqrt(max(s, eps^2))`` (same function: sqrt is
    monotone) so the gradient at an exactly-zero row is 0, like torch's
    norm subgradient — ``max(sqrt(s), eps)`` instead evaluates
    d sqrt/ds = inf at s=0 and the max's zero cotangent turns it into
    inf*0 = NaN, killing the whole step's gradient (bf16 activations
    produce exact-zero rows in real training)."""
    s = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(s, eps * eps))
    return (x.astype(jnp.float32) / n).astype(x.dtype)

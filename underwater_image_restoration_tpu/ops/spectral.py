"""FFT helpers shared by the spectral model blocks and the FFL loss.

All functions take NHWC images; spatial FFTs run over axes (1, 2).  The
reference operates on NCHW with ``dim=(-2, -1)`` — same spatial transform.

The token-space quirk of the New* encoder (reference ``model/model.py:72``)
FFTs over the *(L, C)* axes of the token matrix; that path lives in the model
itself (models/new_model.py) since it is not a spatial transform.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _dft_mats_np(n: int):
    """(D, Dinv) for an n-point DFT as complex64 matmul operands.

    numpy-built in f64 then rounded once, so the matrices are closer to
    the exact twiddles than an f32 cos/sin evaluation.  The cache holds
    NUMPY arrays only — a cached jnp constant created under a remat
    trace leaks that trace's tracer (observed UnexpectedTracerError)."""
    k = np.arange(n)
    ang = -2.0j * np.pi / n * np.outer(k, k)
    d = np.exp(ang)
    return (np.asarray(d, np.complex64),
            np.asarray(np.conj(d) / n, np.complex64))


def _dft_mats(n: int):
    a, b = _dft_mats_np(n)
    return jnp.asarray(a), jnp.asarray(b)


def _dft_matmul_on() -> bool:
    """UIRT_DFT_MATMUL=1 lowers the spatial FFTs as DFT matmuls.

    The round-5 residual attribution prices the UpS spectral path at ~12%
    of the train step; XLA's TPU FFT runs butterflies on the VPU — the
    step's contended unit — while the MXU idles.  A dense (H,H) complex
    DFT matmul is ~25x the flops but rides the MXU (the r3 microbench put
    the two within noise of each other in isolation).  Numerics: agrees
    with the FFT to f32 roundoff (~1e-6 rel), NOT bit-identical — default
    off; the parity suites run against the FFT path."""
    return os.environ.get("UIRT_DFT_MATMUL", "0") == "1"


def _dft2_apply(x, inverse: bool) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    dh = _dft_mats(h)[1 if inverse else 0]
    dw = _dft_mats(w)[1 if inverse else 0]
    y = jnp.einsum("ih,bhwc->biwc", dh, x.astype(jnp.complex64))
    return jnp.einsum("jw,biwc->bijc", dw, y)


def fft2(x):
    """2D FFT over spatial axes of NHWC (complex output)."""
    if _dft_matmul_on():
        return _dft2_apply(x, inverse=False)
    return jnp.fft.fftn(x, axes=(1, 2))


def safe_abs(f):
    """|f| for complex f with a ZERO (not NaN) gradient at f == 0.

    ``jnp.abs`` of a complex number has gradient (re/|f|, im/|f|) — 0/0 =
    NaN at exactly-zero bins.  Real-input FFTs have structurally-real bins
    (DC/Nyquist rows) and bf16-quantized activations cancel to exact zeros
    readily, so training sits on that cliff (observed: finite loss, NaN
    grad after one optimizer step).  torch defines subgradient 0 there
    (torch.abs backward uses sgn, sgn(0)=0), so the reference never dies.
    Forward is bit-identical: only exactly-zero bins are rewritten, where
    abs already returns 0."""
    zero = (jnp.real(f) == 0) & (jnp.imag(f) == 0)
    f_ = jnp.where(zero, jnp.ones((), f.dtype), f)
    return jnp.where(zero, jnp.zeros((), jnp.real(f).dtype), jnp.abs(f_))


@jax.custom_vjp
def _safe_atan2(im, re):
    return jnp.arctan2(im, re)


def _safe_atan2_fwd(im, re):
    return jnp.arctan2(im, re), (im, re)


def _safe_atan2_bwd(res, g):
    im, re = res
    d = re * re + im * im
    zero = d == 0
    d = jnp.where(zero, jnp.ones((), d.dtype), d)
    return (jnp.where(zero, 0, re / d) * g,
            jnp.where(zero, 0, -im / d) * g)


_safe_atan2.defvjp(_safe_atan2_fwd, _safe_atan2_bwd)


def safe_angle(f):
    """angle(f) with a zero gradient at f == 0 (the analytic gradient
    (-im, re)/|f|^2 is NaN at zero bins; torch's subgradient there is 0).

    Forward is ``arctan2(im, re)`` — EXACTLY ``jnp.angle``, including the
    signed-zero edges (angle(-0.0+0j) = pi, not 0: a where-mask substitution
    would get that wrong because -0.0 == 0 is true).  Only the VJP is
    replaced, zeroing the cotangent where |f| == 0."""
    return _safe_atan2(jnp.imag(f), jnp.real(f))


def ifft2(x):
    if _dft_matmul_on():
        return _dft2_apply(x, inverse=True)
    return jnp.fft.ifftn(x, axes=(1, 2))


def fftn_real_spatial(x):
    """real(fftn(x)) over spatial axes — the reference's lossy freq-domain
    projection (e.g. SpectralTransformer.py:103, block.py:538)."""
    return jnp.real(fft2(x.astype(jnp.float32))).astype(x.dtype)


def ifftn_real_spatial(x):
    return jnp.real(ifft2(x.astype(jnp.float32))).astype(x.dtype)


def inv_mag(x):
    """Phase-only reconstruction (reference SpectralTransformer.py:9-13):
    ifft2(exp(i * angle(fft2(x)))).real"""
    f = fft2(x.astype(jnp.float32))
    phase = safe_angle(f)
    return jnp.real(ifft2(jnp.exp(1j * phase))).astype(x.dtype)


def zero_stuff2x(x):
    """(B, H, W, C) -> (B, 2H, 2W, C) with x at the even positions."""
    b, h, w, c = x.shape
    out = jnp.zeros((b, 2 * h, 2 * w, c), x.dtype)
    return out.at[:, ::2, ::2, :].set(x)


def spectral_tile_upsample(mag, phase):
    """The FFT-upsample core (reference SpectralTransformer.py:174-187):
    tile magnitude/phase 2x2 in space, recombine polar, ifft2, abs.

    Computed via the analytic identity ifft2(tile(F, 2, 2)) ==
    zero_stuff2x(ifft2(F)) (split the big-transform index k = a + H*b; the
    b-sum is 1 + e^{i*pi*m} = 2*[m even]) — one (H, W) inverse FFT instead
    of a (2H, 2W) one and no tiled complex intermediate, bit-identical
    output (tests/test_ops_basic.py pins it against the literal form)."""
    comp = mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)
    return zero_stuff2x(safe_abs(ifft2(comp)))

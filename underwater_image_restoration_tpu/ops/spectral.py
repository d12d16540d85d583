"""FFT helpers shared by the spectral model blocks and the FFL loss.

All functions take NHWC images; spatial FFTs run over axes (1, 2).  The
reference operates on NCHW with ``dim=(-2, -1)`` — same spatial transform.

The token-space quirk of the New* encoder (reference ``model/model.py:72``)
FFTs over the *(L, C)* axes of the token matrix; that path lives in the model
itself (models/new_model.py) since it is not a spatial transform.
"""
from __future__ import annotations

import jax.numpy as jnp


def fft2(x):
    """2D FFT over spatial axes of NHWC (complex output)."""
    return jnp.fft.fftn(x, axes=(1, 2))


def ifft2(x):
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
    phase = jnp.angle(f)
    return jnp.real(ifft2(jnp.exp(1j * phase))).astype(x.dtype)


def spectral_tile_upsample(mag, phase):
    """The FFT-upsample core (reference SpectralTransformer.py:174-187):
    tile magnitude/phase 2x2 in space, recombine polar, ifft2, abs."""
    mag2 = jnp.tile(mag, (1, 2, 2, 1))
    pha2 = jnp.tile(phase, (1, 2, 2, 1))
    real = mag2 * jnp.cos(pha2)
    imag = mag2 * jnp.sin(pha2)
    out = jnp.fft.ifftn(real + 1j * imag, axes=(1, 2))
    return jnp.abs(out)

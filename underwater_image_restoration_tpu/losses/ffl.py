"""Focal Frequency Loss in JAX, matching the focal_frequency_loss package
(the reference's dependency: losses.py:6,48 with loss_weight=1.0, alpha=1.0).

Re-implemented from the published method (Jiang et al., ICCV 2021;
EndlessSora/focal-frequency-loss) with the package's full option surface —
the reference instantiates the defaults (patch_factor=1, ave_spectrum=False,
log_matrix=False, batch_matrix=False), but the extra knobs are part of the
package API and are pinned against an exact float64 torch transcription
(tests/freq_oracles.py).

- spectrum: orthonormal 2D FFT of each (optionally patch-cropped) channel,
- weight matrix: |F_pred - F_true| ** alpha (optionally log1p'd), normalized
  by the per-(batch, patch, channel) spatial max (or the global max when
  batch_matrix), NaNs zeroed, clamped to [0,1], detached,
- loss: mean(weight * |F_pred - F_true|^2) * loss_weight.

NHWC images; FFT over spatial axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _patch_fft(x, patch_factor: int):
    """(B, H, W, C) -> complex spectra (B, P, H/p, W/p, C), orthonormal."""
    b, h, w, c = x.shape
    if h % patch_factor or w % patch_factor:
        raise ValueError(
            f"patch_factor={patch_factor} must divide image sides {h}x{w}")
    ph, pw = h // patch_factor, w // patch_factor
    # row-major patch order matches the package's nested (i, j) loop
    x = x.reshape(b, patch_factor, ph, patch_factor, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, patch_factor * patch_factor, ph, pw, c)
    return jnp.fft.fft2(x, axes=(2, 3), norm="ortho")


def focal_frequency_loss(
    pred,
    target,
    loss_weight: float = 1.0,
    alpha: float = 1.0,
    patch_factor: int = 1,
    ave_spectrum: bool = False,
    log_matrix: bool = False,
    batch_matrix: bool = False,
):
    fp = _patch_fft(pred.astype(jnp.float32), patch_factor)
    ft = _patch_fft(target.astype(jnp.float32), patch_factor)
    if ave_spectrum:
        fp = jnp.mean(fp, axis=0, keepdims=True)
        ft = jnp.mean(ft, axis=0, keepdims=True)
    d = fp - ft
    freq_distance = jnp.real(d) ** 2 + jnp.imag(d) ** 2  # (B, P, h, w, C)

    matrix = jnp.sqrt(freq_distance) ** alpha
    if log_matrix:
        matrix = jnp.log(matrix + 1.0)
    if batch_matrix:
        matrix = matrix / jnp.max(matrix)
    else:
        # spectral-norm per (batch, patch, channel): divide by spatial max
        matrix = matrix / jnp.max(matrix, axis=(2, 3), keepdims=True)
    matrix = jnp.where(jnp.isnan(matrix), 0.0, matrix)
    matrix = jnp.clip(matrix, 0.0, 1.0)
    weight = jax.lax.stop_gradient(matrix)

    return jnp.mean(weight * freq_distance) * loss_weight

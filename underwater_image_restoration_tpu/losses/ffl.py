"""Focal Frequency Loss in JAX, matching the focal_frequency_loss package
(the reference's dependency: losses.py:6,48 with loss_weight=1.0, alpha=1.0).

Re-implemented from the published method (Jiang et al., ICCV 2021;
EndlessSora/focal-frequency-loss) with the reference's instantiation
defaults: patch_factor=1, ave_spectrum=False, log_matrix=False,
batch_matrix=False.

- spectrum: orthonormal 2D FFT of each channel,
- weight matrix: |F_pred - F_true| ** alpha, normalized by the per-(B,C)
  spatial max, NaNs zeroed, clamped to [0,1], detached,
- loss: mean(weight * |F_pred - F_true|^2) * loss_weight.

NHWC images; FFT over spatial axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_frequency_loss(
    pred,
    target,
    loss_weight: float = 1.0,
    alpha: float = 1.0,
):
    fp = jnp.fft.fft2(pred.astype(jnp.float32), axes=(1, 2), norm="ortho")
    ft = jnp.fft.fft2(target.astype(jnp.float32), axes=(1, 2), norm="ortho")
    d = fp - ft
    freq_distance = jnp.real(d) ** 2 + jnp.imag(d) ** 2  # (B, H, W, C)

    matrix = jnp.sqrt(freq_distance) ** alpha
    # spectral-norm per (batch, channel): divide by spatial max
    max_per = jnp.max(matrix, axis=(1, 2), keepdims=True)
    matrix = matrix / max_per
    matrix = jnp.where(jnp.isnan(matrix), 0.0, matrix)
    matrix = jnp.clip(matrix, 0.0, 1.0)
    weight = jax.lax.stop_gradient(matrix)

    return jnp.mean(weight * freq_distance) * loss_weight

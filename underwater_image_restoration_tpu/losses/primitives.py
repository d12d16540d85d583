"""Loss primitives (jit-compiled JAX; NHWC images).

Reference: ``src/Losses/losses.py`` and ``luminanceLoss.py``.  Numerics match
the torch implementations including their quirks (e.g. the B*C division of
the L1/L2/L1withColor composites, losses.py:57,65,78).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss(pred, target):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def charbonnier_loss(pred, target, eps: float = 1e-3):
    """mean(sqrt(d^2 + eps^2)) (reference losses.py:182-193)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(d * d + eps * eps))


def color_loss(pred, target):
    """Per-channel spatial MSE, averaged over (B, C)
    (reference losses.py:195-213)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    per_channel = jnp.mean(jnp.square(d), axis=(1, 2))  # (B, C) over NHWC spatial
    return jnp.mean(per_channel)


_Y_COEFFS = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def luminance_loss(pred, target):
    """MSE between BT.601 luma maps (reference luminanceLoss.py:5-21)."""
    w = jnp.asarray(_Y_COEFFS)
    yp = jnp.sum(pred.astype(jnp.float32) * w, axis=-1)
    yt = jnp.sum(target.astype(jnp.float32) * w, axis=-1)
    return jnp.mean(jnp.square(yp - yt))


_LAPLACIAN = np.array(
    [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=np.float32
)


def _laplacian_filter(x):
    """Depthwise 3x3 Laplacian, valid padding (reference losses.py:162-177:
    F.conv2d(..., groups=3) with no padding)."""
    c = x.shape[-1]
    k = jnp.asarray(_LAPLACIAN)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))  # HWIO with I=1 (depthwise)
    return lax.conv_general_dilated(
        x.astype(jnp.float32),
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def gradient_loss(pred, target):
    """L1 between Laplacian-filtered maps (reference losses.py:162-181)."""
    return l1_loss(_laplacian_filter(pred), _laplacian_filter(target))


def tv_loss(x, weight: float = 1.0):
    """Total variation (reference losses.py:11-28)."""
    xf = x.astype(jnp.float32)
    b, h, w, c = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum(jnp.square(xf[:, 1:, :, :] - xf[:, : h - 1, :, :]))
    w_tv = jnp.sum(jnp.square(xf[:, :, 1:, :] - xf[:, :, : w - 1, :]))
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b


def psnr(target, pred):
    """20*log10(1/RMSE) over clamped [0,1] tensors
    (reference ModelTrainer.py:17-21)."""
    d = jnp.clip(pred.astype(jnp.float32), 0, 1) - jnp.clip(
        target.astype(jnp.float32), 0, 1
    )
    rmse = jnp.sqrt(jnp.mean(jnp.square(d)))
    return 20.0 * jnp.log10(1.0 / rmse)

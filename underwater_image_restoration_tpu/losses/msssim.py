"""SSIM / MS-SSIM in JAX, numerically matching the pytorch_msssim package
(the reference's dependency: losses.py:5,46, ModelTrainer.py:16,23-24).

Algorithm (re-implemented from the published method, VainF/pytorch-msssim):
- 11-tap gaussian window (sigma 1.5), separable depthwise filtering with
  VALID padding,
- SSIM constants K1=0.01, K2=0.03, data_range=1,
- MS-SSIM: 5 scales with weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333];
  between scales avg-pool 2x2 (stride 2) with symmetric padding of (H%2, W%2)
  and count_include_pad semantics; relu on intermediate cs terms;
  product of cs^w over scales times ssim^w_last.

NHWC images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _gaussian_kernel(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float32) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter_separable(x, win1d):
    """Depthwise separable gaussian filter, VALID padding, NHWC."""
    c = x.shape[-1]
    kh = jnp.asarray(win1d)[:, None, None, None]  # (K,1,1,1)
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.asarray(win1d)[None, :, None, None]
    kw = jnp.tile(kw, (1, 1, 1, c))
    conv = functools.partial(
        lax.conv_general_dilated,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return conv(conv(x, kh), kw)


def _ssim_per_channel(x, y, win1d, data_range=1.0, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu1 = _filter_separable(x, win1d)
    mu2 = _filter_separable(y, win1d)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter_separable(x * x, win1d) - mu1_sq
    sigma2_sq = _filter_separable(y * y, win1d) - mu2_sq
    sigma12 = _filter_separable(x * y, win1d) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # per-channel spatial mean -> (B, C)
    return jnp.mean(ssim_map, axis=(1, 2)), jnp.mean(cs_map, axis=(1, 2))


def _avg_pool2(x, pad_h: int, pad_w: int):
    """torch F.avg_pool2d(kernel=2, padding=(pad_h, pad_w)) with
    count_include_pad=True: symmetric zero pad then mean-pool."""
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)))
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def ssim(x, y, data_range: float = 1.0, win_size: int = 11, win_sigma: float = 1.5):
    """Single-scale SSIM, size-averaged scalar."""
    win = _gaussian_kernel(win_size, win_sigma)
    s, _ = _ssim_per_channel(x, y, win, data_range)
    return jnp.mean(s)


_MS_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], dtype=np.float32)


def ms_ssim(
    x,
    y,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights=None,
):
    """Multi-scale SSIM, size-averaged scalar.  Requires the smallest scale
    to still fit the window: min(H, W) > (win_size-1) * 2^4."""
    w = np.asarray(weights if weights is not None else _MS_WEIGHTS, np.float32)
    min_side = min(x.shape[1], x.shape[2])
    need = (win_size - 1) * 2 ** (len(w) - 1)
    if min_side <= need:
        # same guard as pytorch_msssim (assert at ms_ssim entry); without it
        # the smallest pyramid level underflows and the result is NaN
        raise ValueError(
            f"ms_ssim needs image sides > {need} for {len(w)} scales with "
            f"win_size={win_size}; got {x.shape[1]}x{x.shape[2]}"
        )
    win = _gaussian_kernel(win_size, win_sigma)
    levels = len(w)
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs = _ssim_per_channel(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            pad_h, pad_w = x.shape[1] % 2, x.shape[2] % 2
            x = _avg_pool2(x.astype(jnp.float32), pad_h, pad_w)
            y = _avg_pool2(y.astype(jnp.float32), pad_h, pad_w)
    ssim_pc = jax.nn.relu(ssim_pc)
    stack = jnp.stack(mcs + [ssim_pc], axis=0)  # (levels, B, C)
    val = jnp.prod(stack ** jnp.asarray(w)[:, None, None], axis=0)
    return jnp.mean(val)

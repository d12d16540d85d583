"""Offline evaluation metrics (reference ``eval.ipynb`` cells + ``utils.py``).

- ``save_img``: [-1,1] float -> [0,255] PNG (reference utils.py:22-29).
- ``psnr_float_pm1``: skimage PSNR on float arrays — skimage infers
  data_range=2 for float dtype (range (-1,1)), which is exactly how the
  notebook's published 9.53 dB was computed (eval.ipynb cell initial_id).
- ``psnr_gray_u8``: grayscale uint8 PSNR, data_range 255, matching the
  cv2.cvtColor(BGR2GRAY)+skimage pass (eval.ipynb cell aa2ca2a3).
- ``ssim_pair_u8``: SSIM on uint8 pairs via the JAX SSIM (data_range 255);
  stands in for SSIM_PIL.compare_ssim (not installable here).
- ``drop_lowest``: the notebook's np.sort(PSNR)[4:] trimming quirk.
"""
from __future__ import annotations

import os

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def save_img(arr_pm1: np.ndarray, path: str):
    """HWC (or CHW) float in [-1,1] -> uint8 PNG (reference utils.py:22-29:
    (x+1)/2*255)."""
    a = np.asarray(arr_pm1)
    if a.ndim == 3 and a.shape[0] in (1, 3) and a.shape[-1] not in (1, 3):
        a = a.transpose(1, 2, 0)
    a = np.clip((a + 1.0) / 2.0, 0.0, 1.0)
    a = (a * 255).astype(np.uint8)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    Image.fromarray(a.squeeze()).save(path)


def psnr_float_pm1(ref: np.ndarray, pred: np.ndarray) -> float:
    """skimage-compatible PSNR for float arrays: data_range=2 (float dtype
    range is (-1,1) in skimage's dtype_range table)."""
    mse = float(np.mean((np.asarray(ref, np.float64)
                         - np.asarray(pred, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10((2.0 ** 2) / mse)


def to_gray_u8(img_u8: np.ndarray) -> np.ndarray:
    """BT.601 luma with cv2-style rounding on uint8 RGB."""
    f = img_u8.astype(np.float64)
    y = f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def psnr_gray_u8(ref_u8: np.ndarray, pred_u8: np.ndarray) -> float:
    mse = float(np.mean((ref_u8.astype(np.float64)
                         - pred_u8.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)


def ssim_pair_u8(a_u8: np.ndarray, b_u8: np.ndarray) -> float:
    """SSIM over uint8 RGB pairs (data_range 1 on /255 floats)."""
    import jax.numpy as jnp

    from ..losses.msssim import ssim

    a = jnp.asarray(a_u8, jnp.float32)[None] / 255.0
    b = jnp.asarray(b_u8, jnp.float32)[None] / 255.0
    return float(ssim(a, b, data_range=1.0))


def drop_lowest(values: np.ndarray, n: int = 4) -> np.ndarray:
    """np.sort(x)[n:] — the notebook drops the 4 lowest PSNR samples before
    averaging (eval.ipynb cell aa2ca2a3)."""
    return np.sort(np.asarray(values))[n:]

"""Train-time metrics (reference ModelTrainer.py:17-24).

``psnr_metric`` = 20*log10(1/RMSE) over clamped-[0,1] tensors — reproduced
including the quirk that train tensors live in [-1,1] so the clamp saturates
half the range (torchPSNR is applied to normalized tensors at
ModelTrainer.py:148-149).

``ssim_metric`` = single-scale SSIM, data_range=1, size_average (pytorch_msssim
ssim; ModelTrainer.py:23-24).

Both come in per-sample (vmapped) forms so padded batch rows can be masked.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.msssim import ssim
from ..losses.primitives import psnr as psnr_metric


def ssim_metric(target, pred, data_range: float = 1.0):
    return ssim(target, pred, data_range=data_range)


def per_sample_psnr(target, pred):
    """(B,H,W,C) -> (B,) PSNR per sample."""
    return jax.vmap(lambda t, p: psnr_metric(t[None], p[None]))(target, pred)


def per_sample_ssim(target, pred, data_range: float = 1.0):
    return jax.vmap(lambda t, p: ssim(t[None], p[None], data_range=data_range))(
        target, pred
    )

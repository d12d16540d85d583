"""Standalone transcriptions of the reference's frequency-loss pip packages,
used as exact test oracles.

The reference depends on two pip packages that are NOT installable in this
container:

- ``pytorch_msssim`` (VainF/pytorch-msssim) — imported at reference
  ``losses.py:5,46`` and as the trainer's validation SSIM
  (``ModelTrainer.py:23-24``);
- ``focal_frequency_loss`` (EndlessSora/focal-frequency-loss) — imported at
  reference ``losses.py:6,48`` with ``loss_weight=1.0, alpha=1.0``.

Each is transcribed here, operation for operation, against
``torch.nn.functional`` primitives — the same kernels the packages
themselves call (``F.conv2d`` valid-padding separable gaussian,
``F.avg_pool2d`` with ``count_include_pad=True`` default,
``torch.fft.fft2(norm='ortho')``) — in float64, so the oracle carries no
re-derivation of padding/pooling semantics of our own.  The JAX
implementations (``losses/msssim.py``, ``losses/ffl.py``) are asserted
against these in ``test_losses.py``.

Layout: NCHW float64 torch tensors (the packages' native layout); callers
convert from NHWC.
"""
from __future__ import annotations

import torch
import torch.nn.functional as F


# ---------------- pytorch_msssim ----------------


def _fspecial_gauss_1d(size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g.reshape(1, 1, size)


def _gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    """Separable depthwise gaussian filter, VALID padding (per the package:
    one grouped conv2d per spatial dim with the 1-D window transposed into
    that dim)."""
    C = x.shape[1]
    out = x
    for i, s in enumerate(x.shape[2:]):
        assert s >= win.shape[-1], "image smaller than the window"
        out = F.conv2d(out, weight=win.transpose(2 + i, -1), stride=1,
                       padding=0, groups=C)
    return out


def _ssim_per_channel(X, Y, data_range, win, K=(0.01, 0.03)):
    K1, K2 = K
    compensation = 1.0
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu1 = _gaussian_filter(X, win)
    mu2 = _gaussian_filter(Y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    sigma1_sq = compensation * (_gaussian_filter(X * X, win) - mu1_sq)
    sigma2_sq = compensation * (_gaussian_filter(Y * Y, win) - mu2_sq)
    sigma12 = compensation * (_gaussian_filter(X * Y, win) - mu1_mu2)
    cs_map = (2 * sigma12 + C2) / (sigma1_sq + sigma2_sq + C2)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs_map
    ssim_per_channel = torch.flatten(ssim_map, 2).mean(-1)
    cs = torch.flatten(cs_map, 2).mean(-1)
    return ssim_per_channel, cs


def _win(X, win_size, win_sigma):
    return _fspecial_gauss_1d(win_size, win_sigma).repeat(
        [X.shape[1]] + [1] * (len(X.shape) - 1))


def ssim_oracle(X, Y, data_range=1.0, win_size=11, win_sigma=1.5,
                K=(0.01, 0.03)) -> float:
    """pytorch_msssim.ssim(size_average=True, nonnegative_ssim=False)."""
    assert win_size % 2 == 1
    s, _ = _ssim_per_channel(X, Y, data_range, _win(X, win_size, win_sigma),
                             K)
    return float(s.mean())


_MS_WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def ms_ssim_oracle(X, Y, data_range=1.0, win_size=11, win_sigma=1.5,
                   weights=None, K=(0.01, 0.03)) -> float:
    """pytorch_msssim.ms_ssim(size_average=True): 5-scale pyramid via
    F.avg_pool2d(kernel_size=2, padding=(H%2, W%2)) (count_include_pad
    default True), relu'd intermediate cs terms, prod(cs^w)·ssim^w_last."""
    assert win_size % 2 == 1
    smaller_side = min(X.shape[-2:])
    weights = weights if weights is not None else _MS_WEIGHTS
    assert smaller_side > (win_size - 1) * (2 ** (len(weights) - 1))
    wt = torch.tensor(weights, dtype=torch.float64)
    win = _win(X, win_size, win_sigma)
    levels = wt.shape[0]
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs = _ssim_per_channel(X, Y, data_range, win, K)
        if i < levels - 1:
            mcs.append(torch.relu(cs))
            padding = [s % 2 for s in X.shape[2:]]
            X = F.avg_pool2d(X, kernel_size=2, padding=padding)
            Y = F.avg_pool2d(Y, kernel_size=2, padding=padding)
    ssim_pc = torch.relu(ssim_pc)
    mcs_and_ssim = torch.stack(mcs + [ssim_pc], dim=0)  # (levels, B, C)
    val = torch.prod(mcs_and_ssim ** wt.view(-1, 1, 1), dim=0)
    return float(val.mean())


# ---------------- focal_frequency_loss ----------------


def _tensor2freq(x: torch.Tensor, patch_factor: int) -> torch.Tensor:
    _, _, h, w = x.shape
    assert h % patch_factor == 0 and w % patch_factor == 0, (
        "patch factor must divide both image sides")
    ph, pw = h // patch_factor, w // patch_factor
    patches = [
        x[:, :, i * ph:(i + 1) * ph, j * pw:(j + 1) * pw]
        for i in range(patch_factor) for j in range(patch_factor)
    ]
    y = torch.stack(patches, 1)  # (N, P, C, h, w)
    freq = torch.fft.fft2(y, norm="ortho")
    return torch.stack([freq.real, freq.imag], -1)


def ffl_oracle(pred, target, loss_weight=1.0, alpha=1.0, patch_factor=1,
               ave_spectrum=False, log_matrix=False,
               batch_matrix=False) -> float:
    """focal_frequency_loss.FocalFrequencyLoss.forward (matrix=None)."""
    recon_freq = _tensor2freq(pred, patch_factor)
    real_freq = _tensor2freq(target, patch_factor)
    if ave_spectrum:
        recon_freq = torch.mean(recon_freq, 0, keepdim=True)
        real_freq = torch.mean(real_freq, 0, keepdim=True)

    matrix_tmp = (recon_freq - real_freq) ** 2
    matrix_tmp = torch.sqrt(matrix_tmp[..., 0] + matrix_tmp[..., 1]) ** alpha
    if log_matrix:
        matrix_tmp = torch.log(matrix_tmp + 1.0)
    if batch_matrix:
        matrix_tmp = matrix_tmp / matrix_tmp.max()
    else:
        matrix_tmp = matrix_tmp / matrix_tmp.max(-1).values.max(
            -1).values[:, :, :, None, None]
    matrix_tmp[torch.isnan(matrix_tmp)] = 0.0
    matrix_tmp = torch.clamp(matrix_tmp, min=0.0, max=1.0)
    weight_matrix = matrix_tmp.clone().detach()

    tmp = (recon_freq - real_freq) ** 2
    freq_distance = tmp[..., 0] + tmp[..., 1]
    return float(torch.mean(weight_matrix * freq_distance) * loss_weight)

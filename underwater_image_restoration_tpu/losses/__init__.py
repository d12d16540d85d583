"""String-dispatched composite loss system (reference ``src/Losses/losses.py``).

``LossFunction(name)`` mirrors the reference API
(``LossFunction(loss_name, device).getloss(pred, truth)``); the returned
callables are pure and jittable.  All ~18 loss names of the reference are
supported with identical weights/semantics, including:

- the B*C division of L1/L1withColor/L1ColorLum/L2 (losses.py:57,65,74,78),
- ``fflMix`` returning the 6-tuple
  (loss, charb, perc, grad, ffl, ssim) (losses.py:108-117),
- the adaptive log-softmax weighting of AdaptiveLuminance* (losses.py:126-147).

Fixed reference crash (SURVEY.md #19): ``L1withColor`` uses the luminance
loss (losses.py:63) which the reference constructor never builds for that
name — it crashes on the README's own example.  Here it simply works.

The device argument is accepted and ignored (JAX arrays carry placement).
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ffl import focal_frequency_loss
from .msssim import ms_ssim, ssim
from .perceptual import vgg_perceptual_loss
from .primitives import (
    charbonnier_loss,
    color_loss,
    gradient_loss,
    l1_loss,
    luminance_loss,
    mse_loss,
    psnr,
    tv_loss,
)

LOSS_NAMES = [
    "L1", "L1withColor", "L1ColorLum", "L2", "charbonnier", "perceptual",
    "gradient", "ms_ssim", "ffl", "mix", "fflMixTV", "bigMix",
    "fflCharbonnier", "fflMix", "LuminanceCharbonnier", "Luminance",
    "AdaptiveLuminanceCharbonnier", "AdaptiveLuminanceFFL", "LuminanceFFL",
    "ssimFFLCharbonnier",
]

# Losses whose value depends on ImageNet-pretrained VGG16 features
# (reference losses.py:219-222).  Training these against the deterministic
# placeholder trunk silently diverges from the reference, so LossFunction
# refuses unless real weights are supplied or the caller opts in.
PERCEPTUAL_FAMILY = frozenset(
    {"perceptual", "mix", "bigMix", "fflMix", "fflMixTV"})


def _adaptive_pair(a, b):
    """0.5/0.5 weights modulated by softmax(-log(detached losses))
    (reference losses.py:126-136)."""
    losses = jnp.stack([a, b])
    scales = jnp.log(jax.lax.stop_gradient(losses) + 1e-6)
    scales = jax.nn.softmax(-scales)
    return jnp.sum(losses * jnp.asarray([0.5, 0.5]) * scales)


class LossFunction:
    """name -> jittable (pred, truth) -> scalar (or 6-tuple for fflMix)."""

    def __init__(self, loss_name: str, device=None, vgg_weights: str = "",
                 allow_placeholder_vgg: bool = False):
        if loss_name not in LOSS_NAMES:
            raise ValueError(f"Unsupported loss: {loss_name}")
        if loss_name in PERCEPTUAL_FAMILY:
            have_weights = bool(vgg_weights) and os.path.exists(vgg_weights)
            allowed = (allow_placeholder_vgg
                       or os.environ.get("UIRT_ALLOW_PLACEHOLDER_VGG"))
            if not have_weights and not allowed:
                raise FileNotFoundError(
                    f"Loss '{loss_name}' needs ImageNet-pretrained VGG16 "
                    f"features (reference losses.py:219-222) but no weights "
                    f"file was found (vgg_weights={vgg_weights!r}). Convert "
                    "one with `python -m underwater_image_restoration_tpu."
                    "tools.convert_vgg16 --out vgg16_features.npz` (needs "
                    "torchvision) and pass --vgg-weights, or opt into the "
                    "random placeholder trunk with --allow-placeholder-vgg "
                    "(training will NOT match the reference).")
        self.loss_name = loss_name
        self._vgg = vgg_weights
        # returns_components mirrors the reference's fflMix 6-tuple contract
        self.returns_components = loss_name == "fflMix"
        # How the loss scales with the batch dimension (consumers: gradient
        # accumulation and the masked per-sample validation loss):
        #   bc_divided   — the reference divides these by B*C
        #                  (losses.py:57,65,78), so the value is NOT a batch
        #                  mean: evaluating on half the batch DOUBLES it.
        #   batch_linear — batch loss == mean of single-sample losses.  True
        #                  for every other name except the Adaptive* pair,
        #                  whose softmax weights couple the whole batch
        #                  (losses.py:126-136).
        self.bc_divided = loss_name in ("L1", "L1withColor", "L1ColorLum",
                                        "L2")
        self.batch_linear = not (self.bc_divided
                                 or loss_name.startswith("Adaptive"))

    # -- primitive shims ---------------------------------------------------
    def _perc(self, p, t):
        return vgg_perceptual_loss(p, t, weights_path=self._vgg)

    def _msssim(self, p, t):
        return ms_ssim(p, t, data_range=1.0)

    # ----------------------------------------------------------------------
    def getloss(self, pred, truth):
        name = self.loss_name
        p, t = pred, truth
        bc = t.shape[0] * t.shape[-1]  # B*C (reference divides by NCHW dims 0,1)

        if name == "L1":
            return l1_loss(p, t) / bc
        if name in ("L1withColor", "L1ColorLum"):
            loss = 0.5 * color_loss(p, t)
            loss = loss + 0.25 * l1_loss(p, t)
            loss = loss + 0.25 * luminance_loss(p, t)
            return loss / bc
        if name == "L2":
            return mse_loss(p, t) / bc
        if name == "charbonnier":
            return charbonnier_loss(p, t)
        if name == "perceptual":
            return self._perc(p, t)
        if name == "gradient":
            return gradient_loss(p, t)
        if name == "ms_ssim":
            return 1.0 - self._msssim(p, t)
        if name == "ffl":
            return focal_frequency_loss(p, t)
        if name == "mix":
            return (
                0.03 * charbonnier_loss(p, t)
                + 0.025 * self._perc(p, t)
                + 0.02 * gradient_loss(p, t)
                + 0.01 * (1.0 - self._msssim(p, t))
            )
        if name == "fflMixTV":
            return (
                0.03 * charbonnier_loss(p, t)
                + 0.025 * self._perc(p, t)
                + 0.02 * gradient_loss(p, t)
                + 0.01 * (1.0 - self._msssim(p, t))
                + 0.02 * focal_frequency_loss(p, t)
                + tv_loss(p)
            )
        if name == "bigMix":
            return (
                0.4 * charbonnier_loss(p, t)
                + 0.25 * self._perc(p, t)
                + 0.25 * gradient_loss(p, t)
                + 0.1 * (1.0 - self._msssim(p, t))
            )
        if name == "fflCharbonnier":
            return focal_frequency_loss(p, t) + charbonnier_loss(p, t)
        if name == "fflMix":
            charb = charbonnier_loss(p, t)
            perc = self._perc(p, t)
            grad = gradient_loss(p, t)
            ffl = focal_frequency_loss(p, t)
            ssim_l = 1.0 - self._msssim(p, t)
            loss = 0.03 * charb + 0.025 * perc + 0.01 * grad + 0.005 * ffl + 0.1 * ssim_l
            return loss, charb, perc, grad, ffl, ssim_l
        if name == "LuminanceCharbonnier":
            return luminance_loss(p, t) + charbonnier_loss(p, t)
        if name == "Luminance":
            return luminance_loss(p, t)
        if name == "AdaptiveLuminanceCharbonnier":
            return _adaptive_pair(charbonnier_loss(p, t), luminance_loss(p, t))
        if name == "AdaptiveLuminanceFFL":
            return _adaptive_pair(focal_frequency_loss(p, t), luminance_loss(p, t))
        if name == "LuminanceFFL":
            return focal_frequency_loss(p, t) + luminance_loss(p, t)
        if name == "ssimFFLCharbonnier":
            return (
                0.025 * focal_frequency_loss(p, t)
                + 0.025 * charbonnier_loss(p, t)
                + (1.0 - self._msssim(p, t))
            )
        raise ValueError(f"Unsupported loss: {name}")

    __call__ = getloss


__all__ = [
    "LossFunction",
    "LOSS_NAMES",
    "charbonnier_loss",
    "color_loss",
    "focal_frequency_loss",
    "gradient_loss",
    "l1_loss",
    "luminance_loss",
    "mse_loss",
    "ms_ssim",
    "psnr",
    "ssim",
    "tv_loss",
    "vgg_perceptual_loss",
]

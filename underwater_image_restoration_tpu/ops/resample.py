"""Pixel shuffle/unshuffle and interpolation in NHWC with torch channel order.

Torch semantics (needed so converted checkpoints and the surrounding convs
agree):
- pixel_unshuffle(r): out[..., c*r*r + i*r + j] = in[h*r+i, w*r+j, c]
- pixel_shuffle(r):   inverse
(reference uses nn.PixelUnshuffle(2)/nn.PixelShuffle(2) in
SpectralTransformer.py:151-158,191-198 and block.py:107-153.)
"""
from __future__ import annotations

import einops
import jax
import jax.numpy as jnp


def pixel_unshuffle(x, r: int = 2):
    return einops.rearrange(x, "b (h i) (w j) c -> b h w (c i j)", i=r, j=r)


def pixel_shuffle(x, r: int = 2):
    return einops.rearrange(x, "b h w (c i j) -> b (h i) (w j) c", i=r, j=r)


def resize_bilinear(x, h: int, w: int):
    """Bilinear resize, antialias off — matches F.interpolate(mode='bilinear',
    align_corners=False) used by the VGG perceptual loss (losses.py:239-240)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bilinear", antialias=False)


def resize_bicubic(x, h: int, w: int):
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bicubic", antialias=False)


def tokens_to_image(x, h: int = None, w: int = None):
    """(B, L, C) -> (B, H, W, C); L must be a square if h/w not given."""
    b, l, c = x.shape
    if h is None:
        h = w = int(l**0.5)
        assert h * w == l, f"token length {l} is not square"
    return x.reshape(b, h, w, c)


def image_to_tokens(x):
    """(B, H, W, C) -> (B, H*W, C)."""
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)

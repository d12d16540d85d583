"""VGG16 perceptual loss (reference losses.py:215-255).

The reference uses torchvision's ImageNet-pretrained VGG16, frozen, taking L1
distances over feature blocks [:4], [4:9], [9:16], [16:23] after ImageNet
normalization and bilinear resize to 224².

TPU-native version: the VGG16 feature trunk is implemented directly in JAX
(plain convs — weights are frozen constants, no flax module needed) and its
weights load from an ``.npz`` produced by ``tools/convert_vgg16.py`` (run it
anywhere torchvision is available; this container has no torchvision and no
network).  Without a weights file a deterministic He-normal placeholder is
used so the loss still runs/compiles — a warning is emitted once, and
training quality for the perceptual-loss configs will not match the
reference until real weights are supplied.
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.resample import resize_bilinear

# (name, out_channels, in_channels); "M" = maxpool.  torchvision vgg16.features
# layout; block boundaries after indices 3, 8, 15, 22.
_VGG16_CFG = [
    ("conv0", 64, 3),
    ("conv2", 64, 64),
    "M",
    ("conv5", 128, 64),
    ("conv7", 128, 128),
    "M",
    ("conv10", 256, 128),
    ("conv12", 256, 256),
    ("conv14", 256, 256),
    "M",
    ("conv17", 512, 256),
    ("conv19", 512, 512),
    ("conv21", 512, 512),
]
# feature taps: after ReLU of these convs (== torch indices 3, 8, 15, 22)
_TAPS = {"conv2", "conv7", "conv14", "conv21"}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_warned = False


def _placeholder_weights() -> Dict[str, np.ndarray]:
    global _warned
    if not _warned:
        warnings.warn(
            "VGG16 weights file not found — using deterministic placeholder "
            "weights. Perceptual-loss training will not match the reference "
            "until you provide a converted checkpoint "
            "(tools/convert_vgg16.py -> vgg16_features.npz).",
            stacklevel=2,
        )
        _warned = True
    rng = np.random.default_rng(1234)
    out = {}
    for item in _VGG16_CFG:
        if item == "M":
            continue
        name, oc, ic = item
        fan_in = ic * 9
        out[f"{name}.kernel"] = (
            rng.standard_normal((3, 3, ic, oc)).astype(np.float32)
            * np.sqrt(2.0 / fan_in)
        )
        out[f"{name}.bias"] = np.zeros((oc,), np.float32)
    return out


@functools.lru_cache(maxsize=2)
def load_vgg16_weights(path: str = "") -> Tuple:
    """Load converted weights (HWIO kernels).  Returns a tuple of
    (name, kernel, bias) so it hashes for jit closure purposes."""
    if path and os.path.exists(path):
        data = dict(np.load(path))
        weights = {}
        for item in _VGG16_CFG:
            if item == "M":
                continue
            name, oc, ic = item
            k = data[f"{name}.kernel"]
            assert k.shape == (3, 3, ic, oc), f"{name}: bad shape {k.shape}"
            weights[f"{name}.kernel"] = k.astype(np.float32)
            weights[f"{name}.bias"] = data[f"{name}.bias"].astype(np.float32)
    else:
        weights = _placeholder_weights()
    items = []
    for item in _VGG16_CFG:
        if item == "M":
            items.append(("M", None, None))
        else:
            name = item[0]
            items.append((name, weights[f"{name}.kernel"], weights[f"{name}.bias"]))
    return tuple(items)


def _vgg_features(x, layers) -> List:
    """Run the trunk, return the 4 tap activations.  x: NHWC in [0, 1]-ish."""
    feats = []
    y = x
    for name, k, b in layers:
        if name == "M":
            y = lax.reduce_window(
                y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        y = lax.conv_general_dilated(
            y, jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(b)
        y = jax.nn.relu(y)
        if name in _TAPS:
            feats.append(y)
    return feats


def vgg_perceptual_loss(pred, target, weights_path: str = "", resize: bool = True):
    """L1 over the 4 VGG16 feature levels (reference losses.py:232-248;
    feature_layers=[0,1,2,3], no style/Gram terms on the train path)."""
    layers = load_vgg16_weights(weights_path)
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    p = (pred.astype(jnp.float32) - mean) / std
    t = (target.astype(jnp.float32) - mean) / std
    if resize:
        p = resize_bilinear(p, 224, 224)
        t = resize_bilinear(t, 224, 224)
    fp = _vgg_features(p, layers)
    ft = _vgg_features(t, layers)
    loss = 0.0
    for a, b in zip(fp, ft):
        loss = loss + jnp.mean(jnp.abs(a - b))
    return loss

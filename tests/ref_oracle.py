"""Load reference torch models from /root/reference as numerics oracles.

The reference depends on timm/sympy/pywt/torchvision, none of which are in
this container; this installs minimal functional stubs (only the APIs the
reference actually touches) before importing.  Stubs affect init-time
randomness only — conversion tests convert the oracle's state_dict, so any
init values work; forward math uses real torch ops.
"""
from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE = "/root/reference"


def _install_stubs():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    if "pywt" not in sys.modules:
        pywt = types.ModuleType("pywt")
        s = 2.0 ** -0.5

        class Wavelet:
            def __init__(self, name):
                assert name == "haar", name
                self.dec_lo = [s, s]
                self.dec_hi = [-s, s]
                self.rec_lo = [s, s]
                self.rec_hi = [s, -s]

        pywt.Wavelet = Wavelet
        sys.modules["pywt"] = pywt

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        layers = types.ModuleType("timm.layers")

        class DropPath(nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = float(drop_prob)

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                return x / keep * mask

        def to_2tuple(v):
            return v if isinstance(v, tuple) else (v, v)

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            return nn.init.trunc_normal_(tensor, mean, std, a * std, b * std)

        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = trunc_normal_
        timm.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = layers

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")

        def resize(img, size, *a, **k):
            h, w = (size, size) if isinstance(size, int) else tuple(size)
            if img.shape[-2:] == (h, w):
                return img
            return F.interpolate(img, size=(h, w), mode="bilinear",
                                 align_corners=False, antialias=True)

        fn.resize = resize
        tr.functional = fn
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = fn


def load_reference_module(relpath: str, name: str):
    """Import a reference source file with stubs + the src package visible."""
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    spec = importlib.util.spec_from_file_location(
        name, f"{REFERENCE}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_new_model_module():
    """reference src/model/model.py (MyModel / MyBigModel / MyBigFRFNModel)."""
    return load_reference_module("src/model/model.py", "ref_new_model")


def load_ast_module():
    return load_reference_module("src/Models/AST.py", "ref_ast")


def load_spectral_module():
    return load_reference_module(
        "src/Models/SpectralTransformer.py", "ref_spectral2")

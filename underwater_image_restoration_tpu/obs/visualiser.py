"""Inference/visualization path (reference ``src/utils/Visualiser.py``).

``process_image_using_model``: PIL open -> bicubic resize 256^2 -> normalize
(mean/std 0.5) -> model -> clip [0,1] -> PNG under ``Images/<dir><name>.png``
(Visualiser.py:15-61).  Works on any callable ``apply(x_nhwc) -> y_nhwc``.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def _prep_image(path: str, size: int = 256) -> np.ndarray:
    rgb = Image.open(path).convert("RGB")
    rgb = rgb.resize((size, size), Image.BICUBIC)
    arr = np.asarray(rgb, np.float32) / 255.0
    return ((arr - 0.5) / 0.5)[None]  # (1,H,W,3) in [-1,1]


def save_from_array(directory: str, save_name: str, result: np.ndarray,
                    root: str = "Images") -> "Image.Image":
    """NHWC/HWC float array -> clip[0,1] -> uint8 PNG (Visualiser.py:36-61).
    Note the reference clips to [0,1] even though inputs are normalized to
    [-1,1] — model outputs are expected in [0,1]; behavior preserved."""
    arr = np.asarray(result)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(arr, 0.0, 1.0)
    arr = (arr * 255).astype(np.uint8)
    img = Image.fromarray(arr).convert("RGB")
    out_dir = os.path.join(root, directory) if directory else root
    os.makedirs(out_dir, exist_ok=True)
    img.save(os.path.join(out_dir, f"{save_name}.png"))
    return img


def process_image_using_model(
    apply_fn: Callable[[np.ndarray], np.ndarray],
    file_to_test: str,
    directory: str,
    save_name: str,
    size: int = 256,
    logger=None,
):
    x = _prep_image(file_to_test, size)
    y = np.asarray(apply_fn(x))
    img = save_from_array(directory, save_name, y)
    if logger is not None:
        logger.log_image(img, save_name)
    return img


def load_model_from_weights(ckpt_path: str, config, arch: Optional[str] = None,
                            img_size: Optional[int] = None):
    """Build model + restore params (reference Visualiser.py:64-67).
    Returns (model, params); checkpoint format is the Orbax layout written by
    ``train.checkpoint``.  ``img_size`` specializes size-dependent archs
    (AST/New*) to the inference resolution."""
    from ..models import init_model
    from ..train.checkpoint import restore_params

    model = init_model(arch or config.arch, use_dwt=config.use_dwt,
                       img_size=img_size or config.image_size)
    params = restore_params(ckpt_path)
    return model, params

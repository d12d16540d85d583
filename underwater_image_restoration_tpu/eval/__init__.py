"""Evaluation & analysis subsystem (reference ``eval.ipynb``,
``uqim_utils.py``, ``utils.py``, ``src/Interpretability.ipynb``)."""
from .uiqm import compute_uiqm, getUIQM
from .metrics import (
    drop_lowest,
    psnr_float_pm1,
    psnr_gray_u8,
    save_img,
    ssim_pair_u8,
    to_gray_u8,
)
from .evaluate import (
    dir_ssim_psnr,
    evaluate_pairs,
    infer_directory,
    uiqm_sweep,
)
from .gradcam import grad_cam

__all__ = [
    "compute_uiqm",
    "dir_ssim_psnr",
    "drop_lowest",
    "evaluate_pairs",
    "getUIQM",
    "grad_cam",
    "infer_directory",
    "psnr_float_pm1",
    "psnr_gray_u8",
    "save_img",
    "ssim_pair_u8",
    "to_gray_u8",
    "uiqm_sweep",
]

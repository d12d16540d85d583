"""Convert torchvision's ImageNet VGG16 features to the ``.npz`` layout the
JAX perceptual loss consumes (losses/perceptual.py: HWIO kernels named
``conv<i>.kernel`` / ``conv<i>.bias`` for torch feature indices
0,2,5,7,10,12,14,17,19,21).

Run wherever torchvision is installed (it is NOT in this container):

    python -m underwater_image_restoration_tpu.tools.convert_vgg16 \
        --out vgg16_features.npz
"""
from __future__ import annotations

import argparse

import numpy as np

_CONV_IDXS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]


def convert_state_dict(features_state: dict) -> dict:
    """torch ``vgg16.features.state_dict()`` -> npz dict (numpy arrays)."""
    out = {}
    for i in _CONV_IDXS:
        w = np.asarray(features_state[f"{i}.weight"])  # OIHW
        b = np.asarray(features_state[f"{i}.bias"])
        out[f"conv{i}.kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out[f"conv{i}.bias"] = b.astype(np.float32)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="vgg16_features.npz")
    args = p.parse_args(argv)
    try:
        import torch  # noqa: F401
        from torchvision.models import vgg16, VGG16_Weights
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "torchvision is required for the conversion (run this on a "
            f"machine that has it): {e}"
        )
    model = vgg16(weights=VGG16_Weights.IMAGENET1K_V1)
    state = {k: v.numpy() for k, v in model.features.state_dict().items()}
    np.savez(args.out, **convert_state_dict(state))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

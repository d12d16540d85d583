"""TPU-side 512^2 forward-parity spot-check of the published-checkpoint arch.

CPU-budget parity tests pin the NewBig* family at 128^2 (tests/
test_convert.py); this one-shot script closes the remaining gap by running
the REAL shape: the reference's published-checkpoint architecture
(MyBigModel, Wavelet — eval.ipynb cell 1) at its 512^2 eval resolution,
torch-CPU reference vs our converted flax model on the ambient JAX device
(the TPU when run normally).

Usage:  python experiments/parity_512_tpu.py  [--size 512]

The torch side reuses tests/ref_oracle.py (the reference's own forward
crashes — model.py:396,449 — so submodules are driven in the working order,
same as the CPU parity tests).  Result is printed as one JSON line; record
it in PARITY.md.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def torch_reference_forward(size: int):
    """(state_dict numpy, input NCHW, output NHWC) from the reference model."""
    import numpy as np
    import torch

    import ref_oracle

    mod = ref_oracle.load_new_model_module()
    torch.manual_seed(0)
    m = mod.MyBigModel(img_size=size, use_dwt="Wavelet")
    m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    x = np.random.default_rng(5).standard_normal((1, 3, size, size)).astype(
        np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        y = m.input_proj(xt)
        skips = []
        for lvl in range(4):
            y = getattr(m, f"encoder_{lvl}")(y)
            if hasattr(m, f"encoder_{lvl}_1"):
                y = getattr(m, f"encoder_{lvl}_1")(y)
            skips.append(y)
            y = getattr(m, f"downsample_{lvl}")(y)
        y = m.bottleneck(y)
        for lvl in (3, 2, 1, 0):
            y = getattr(m, f"upsample_{lvl}")(y)
            y = getattr(m, f"decoder_{lvl}")(y, enc_out=skips[lvl])
            if hasattr(m, f"decoder_{lvl}_1"):
                y = getattr(m, f"decoder_{lvl}_1")(y)
        b, l, c = y.shape
        h = w = int(math.sqrt(l))
        img = y.transpose(1, 2).reshape(b, c, h, w)
        out = m.output_proj(img) + xt
    return sd, x, out.numpy().transpose(0, 2, 3, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import numpy as np

    sd, x, want = torch_reference_forward(args.size)

    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.models import init_model
    from underwater_image_restoration_tpu.tools.convert_checkpoint import (
        convert_state_dict,
    )

    # the 512^2 Pallas graph OOMs the remote compile host (PERF_NOTES.md)
    os.environ.setdefault("UIRT_NO_PALLAS", "1")
    variables = convert_state_dict("NewBigModel", sd)
    ours = init_model("NewBigModel", img_size=args.size, use_dwt="Wavelet")
    got = np.asarray(jax.jit(ours.apply)(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))

    diff = np.abs(got - want)
    denom = np.abs(want) + 1e-6
    result = {
        "check": f"NewBigModel-Wavelet@{args.size} forward parity "
                 "(converted reference weights)",
        "platform": jax.devices()[0].platform,
        "max_abs_diff": float(diff.max()),
        "max_rel_diff": float((diff / denom).max()),
        "out_range": [float(want.min()), float(want.max())],
        "pass": bool(diff.max() < 5e-3),  # f32 vs TPU f32 (MXU bf16-accum
        #                                   paths disabled under jit f32)
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

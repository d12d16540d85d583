"""Flop-level A/B of activation-checkpoint policies (CPU compile only).

Per-block remat recomputes each block's whole forward in the backward —
measured +17.9% train-step flops on SpectralTransformer@256 (PERF_NOTES.md).
``remat_policy="mxu"`` (ops.layers.REMAT_POLICIES) saves dot/conv/FFT
outputs instead, so the backward recompute stays off the MXU.  This script
compiles the fused train step under each policy and reports cost_analysis
GFLOP/img, bounding the on-chip win before spending TPU time.

Usage: python experiments/ablate_remat_policy.py [arch] [size] [batch]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def step_gflop_per_img(arch, size, batch, **kw):
    from underwater_image_restoration_tpu.train.benchlib import TrainStepBench

    b = TrainStepBench(arch, size, batch, n_batches=1, **kw)
    raw, ref = b.batches[0]
    compiled = b.step.lower(b.state, raw, ref, b.rng).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0)) / batch / 1e9


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "SpectralTransformer"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    kw = {"use_dwt": "Wavelet"} if arch.startswith("New") else {}
    cells = [
        ("remat=False", {"remat": False}),
        ("remat policy=None", {"remat": True}),
        ("remat policy=mxu", {"remat": True, "remat_policy": "mxu"}),
        ("remat policy=mxu+ew", {"remat": True, "remat_policy": "mxu+ew"}),
        ("remat policy=dots", {"remat": True, "remat_policy": "dots"}),
    ]
    for label, rkw in cells:
        g = step_gflop_per_img(arch, size, batch, **rkw, **kw)
        print(f"{arch}@{size} bs{batch} {label:20s} {g:8.1f} GFLOP/img",
              flush=True)


if __name__ == "__main__":
    main()

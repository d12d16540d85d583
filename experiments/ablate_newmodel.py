#!/usr/bin/env python
"""Where does NewModel-Wavelet's time go? (VERDICT.md round-1 next #7)

jax.profiler traces through the axon tunnel don't reflect real execution
(the runtime replays op-by-op with host staging under trace — see
PERF_NOTES.md), so this measures by ABLATION with the plain async timing
loop instead: swap one component for a cheap stand-in, re-time the full
train step, and attribute the delta.

Variants:
  - wavelet / fourier / none : FDFP + encoder frequency-branch transform
  - "stub-dwt": dwt2d/idwt2d monkeypatched to shape-compatible
    pixel-(un)shuffles — isolates the Haar einsum/matmul cost from the
    rest of the wavelet data path
  - batch ladder: is bs8 actually the HBM sweet spot?

Usage: python experiments/ablate_newmodel.py [--size 256] [--steps 20]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(arch, size, batch, use_dwt, steps, windows=3):
    from underwater_image_restoration_tpu.train.benchlib import (
        time_train_step,
    )

    kw = {"use_dwt": use_dwt} if arch.startswith("New") else {}
    return time_train_step(arch, size, batch, steps=steps, windows=windows,
                           **kw)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    a = p.parse_args()

    results = {}

    for batch in (8, 16, 32):
        for mode in ("Wavelet", "Fourier", "none"):
            try:
                r = time_step("NewModel", a.size, batch, mode, a.steps)
            except Exception as e:
                r = f"failed: {type(e).__name__}"
            results[f"NewModel-{mode}-bs{batch}"] = r
            print(f"NewModel-{mode}-bs{batch}: {r}", flush=True)

    # stub out the Haar einsum core, keep everything else identical
    import underwater_image_restoration_tpu.ops.wavelets as wav
    import underwater_image_restoration_tpu.models.blocks as blocks
    import underwater_image_restoration_tpu.models.new_model as new_model
    from underwater_image_restoration_tpu.ops.resample import (
        pixel_shuffle, pixel_unshuffle,
    )

    def stub_dwt(x):
        return pixel_unshuffle(x, 2)[..., : x.shape[-1]]

    def stub_idwt(x):
        import jax.numpy as jnp
        return pixel_shuffle(jnp.tile(x, (1, 1, 1, 4)), 2)

    saved = wav.dwt2d, wav.idwt2d
    for mod in (blocks, new_model):
        if hasattr(mod, "dwt2d"):
            mod.dwt2d = stub_dwt
            mod.idwt2d = stub_idwt
    try:
        for batch in (8, 16):
            r = time_step("NewModel", a.size, batch, "Wavelet", a.steps)
            results[f"NewModel-stubdwt-bs{batch}"] = r
            print(f"NewModel-stubdwt-bs{batch}: {r}", flush=True)
    finally:
        for mod in (blocks, new_model):
            if hasattr(mod, "dwt2d"):
                mod.dwt2d, mod.idwt2d = saved

    print(results)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Quantify the per-level cost of the SpectralTransformer 256^2 train step
(VERDICT.md round-1 next #6: the C=16/32 full-res levels pad the 128-lane
minor dim 8x/4x — how much does that actually cost?).

Method: ablation timing (jax.profiler traces are unusable through the axon
tunnel — see PERF_NOTES.md).  num_blocks=(n0,n1,n2,n3) zeroes whole levels;
the delta vs baseline attributes wall-clock to the removed blocks.  The
UpS FFT up-samplers and the level-0 stem remain in every variant.

Usage: python experiments/ablate_spectral_levels.py [--batch 64]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_spectral(batch, steps=20, windows=3, **model_kw):
    from underwater_image_restoration_tpu.train.benchlib import TrainStepBench

    bench = TrainStepBench("SpectralTransformer", 256, batch, **model_kw)
    return bench.best_ms_per_step(steps=steps, windows=windows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    a = p.parse_args()

    variants = {
        # (num_blocks, num_refinement): baseline (2,3,3,4)+4
        "baseline": dict(num_blocks=(2, 3, 3, 4), num_refinement=4),
        # remove the full-res C=16/32 transformer blocks (enc0 at C=16,
        # dec2+refinement at C=32, all at 256^2)
        "no-fullres-blocks": dict(num_blocks=(0, 3, 3, 4), num_refinement=0),
        # remove the 128^2 C=32/64 level blocks (enc1 + dec1)
        "no-128-blocks": dict(num_blocks=(2, 0, 3, 4), num_refinement=4),
        # remove the 64^2 C=64 level (enc2 + dec0)
        "no-64-blocks": dict(num_blocks=(2, 3, 0, 4), num_refinement=4),
        # remove the 32^2 C=128 bottleneck blocks
        "no-32-blocks": dict(num_blocks=(2, 3, 3, 0), num_refinement=4),
    }
    out = {}
    for name, kw in variants.items():
        try:
            ms = time_spectral(a.batch, **kw)
        except Exception as e:
            ms = f"failed: {type(e).__name__}"
        out[name] = ms
        print(f"{name}: {ms if isinstance(ms, str) else f'{ms:.3f} ms/step'}",
              flush=True)
    if all(isinstance(v, float) for v in out.values()):
        base = out["baseline"]
        print(f"\nbaseline {base:.3f} ms/step @ batch {a.batch}")
        for name, ms in out.items():
            if name == "baseline":
                continue
            print(f"{name}: removes {base - ms:+.3f} ms "
                  f"({100 * (base - ms) / base:.1f}% of step)")


if __name__ == "__main__":
    main()

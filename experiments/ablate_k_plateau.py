"""Where does K-steps-per-dispatch saturate the chip?

NOTE: the "342k img/s at K=32, no plateau" reading that motivated this
sweep predates the benchlib value-fetch fix and was an enqueue-rate
artifact (PERF_NOTES.md "THE MEASUREMENT BUG").  With honest timing the
expected K-curve is a modest latency amortization (~5 ms enqueue vs tens
of ms of real step time) that flattens almost immediately — this sweep
verifies that, and experiments/remeasure_honest.py carries the canonical
cells.

Usage: python experiments/ablate_k_plateau.py  (on the TPU)
Prints img/s per (arch, batch, K) cell.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = [
    # (label, arch, kwargs, size, batch, k_steps, no_pallas)
    ("Spectral@256 bs64 K=32", "SpectralTransformer", {}, 256, 64, 32, False),
    ("Spectral@256 bs64 K=64", "SpectralTransformer", {}, 256, 64, 64, False),
    ("Spectral@256 bs64 K=128", "SpectralTransformer", {}, 256, 64, 128, False),
    # fflMix (VGG+MS-SSIM+FFL) and 1024^2 were only measured at K=1 in
    # round 1 — both plausibly dispatch-bound too
    ("Spectral@256 bs16 fflMix K=1", "SpectralTransformer",
     {"lossf": "fflMix"}, 256, 16, 1, False),
    ("Spectral@256 bs16 fflMix K=8", "SpectralTransformer",
     {"lossf": "fflMix"}, 256, 16, 8, False),
    ("Spectral@1024 bs1 K=1", "SpectralTransformer", {}, 1024, 1, 1, False),
    ("Spectral@1024 bs1 K=8", "SpectralTransformer", {}, 1024, 1, 8, False),
    ("Spectral@1024 bs1 K=16", "SpectralTransformer", {}, 1024, 1, 16, False),
    ("AST@256 bs32 K=16", "AST", {}, 256, 32, 16, False),
    ("AST@256 bs32 K=32", "AST", {}, 256, 32, 32, False),
    ("AST@256 bs32 K=64", "AST", {}, 256, 32, 64, False),
    ("NewModel-W@256 bs16 K=16", "NewModel", {"use_dwt": "Wavelet"}, 256, 16,
     16, False),
    ("NewModel-W@256 bs16 K=32", "NewModel", {"use_dwt": "Wavelet"}, 256, 16,
     32, False),
    ("NewBigModel@512 bs4 K=16", "NewBigModel", {"use_dwt": "Wavelet"}, 512,
     4, 16, True),
    ("NewBigModel@512 bs4 K=32", "NewBigModel", {"use_dwt": "Wavelet"}, 512,
     4, 32, True),
]


def main():
    from underwater_image_restoration_tpu.train.benchlib import time_train_step

    for label, arch, kw, size, batch, k, no_pallas in CELLS:
        prev = os.environ.get("UIRT_NO_PALLAS")
        if no_pallas:
            os.environ["UIRT_NO_PALLAS"] = "1"
        try:
            # >=2 dispatches per timing window regardless of K
            r = time_train_step(arch, size, batch, steps=2, windows=2,
                                n_batches=2, k_steps=k, **kw)
            print(f"{label:28s} {r:9.1f} img/s", flush=True)
        except Exception as e:
            print(f"{label:28s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
        finally:
            if prev is None:
                os.environ.pop("UIRT_NO_PALLAS", None)
            else:
                os.environ["UIRT_NO_PALLAS"] = prev


if __name__ == "__main__":
    main()

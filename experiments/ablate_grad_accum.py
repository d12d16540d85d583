"""Does lax.scan gradient accumulation beat the HBM/compile-host batch wall?

Round-2 finding (PERF_NOTES.md): NewModel-Wavelet@256 is batch-starved —
bs16 is ~2x bs8 — but bs24+ graphs crash the REMOTE COMPILE HELPER (HTTP
500, compile-host memory).  grad_accum keeps the traced graph at microbatch
size (one scan body) while the optimizer sees the full effective batch, so
it may reach effective batches the flat graph cannot compile, and it halves
live activation memory for a given effective batch.

Usage: python experiments/ablate_grad_accum.py  (on the TPU)
Prints img/s for (arch, effective batch, grad_accum) cells.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = [
    # (label, arch, kwargs, size, effective_batch, grad_accum, no_pallas)
    ("NewModel-W@256 bs16 flat", "NewModel", {"use_dwt": "Wavelet"}, 256, 16, 1, False),
    ("NewModel-W@256 bs32 acc2", "NewModel", {"use_dwt": "Wavelet"}, 256, 32, 2, False),
    ("NewModel-W@256 bs48 acc3", "NewModel", {"use_dwt": "Wavelet"}, 256, 48, 3, False),
    ("NewBigModel@512 bs4 flat", "NewBigModel", {"use_dwt": "Wavelet"}, 512, 4, 1, True),
    ("NewBigModel@512 bs8 acc2", "NewBigModel", {"use_dwt": "Wavelet"}, 512, 8, 2, True),
    ("NewBigModel@512 bs16 acc4", "NewBigModel", {"use_dwt": "Wavelet"}, 512, 16, 4, True),
    ("Spectral@256 bs64 flat", "SpectralTransformer", {}, 256, 64, 1, False),
    ("Spectral@256 bs128 acc2", "SpectralTransformer", {}, 256, 128, 2, False),
]


def main():
    from underwater_image_restoration_tpu.train.benchlib import time_train_step

    for label, arch, kw, size, batch, accum, no_pallas in CELLS:
        prev = os.environ.get("UIRT_NO_PALLAS")
        if no_pallas:
            os.environ["UIRT_NO_PALLAS"] = "1"
        try:
            r = time_train_step(arch, size, batch, steps=10, windows=2,
                                n_batches=2, grad_accum=accum, **kw)
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

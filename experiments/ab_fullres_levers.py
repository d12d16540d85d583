#!/usr/bin/env python
"""Hardware A/Bs for the full-res bottleneck (honest value-fetch harness).

Round-3 attribution: 8 full-res blocks = ~77% of the Spectral@256 step, and
the step is VPU/elementwise-bound there, not MXU-bound (microbenches cleared
FFT and raw lane-padding bytes).  Two consequences this script prices:

1. Per-block remat re-RUNS every full-res elementwise op in the backward —
   on a VPU-bound step that recompute is ~the most expensive thing we do,
   not free insurance.  ``remat=False`` at a batch that still fits trades
   HBM for skipping it entirely.
2. The MDTA head rearrange physically transposes full-res tensors
   (UIRT_ATTN_LAYOUT=blhc deletes them; priced separately by
   ab_attn_layout.py, combined here with no-remat).

Usage: python experiments/ab_fullres_levers.py [--cell i]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLHC = {"UIRT_ATTN_LAYOUT": "blhc"}
BHCL = {"UIRT_ATTN_LAYOUT": "bhcl"}

CELLS = [
    # (label, batch, K, kwargs, env)
    ("bs16 K=2 remat (baseline)", 16, 2, {}, BHCL),
    ("bs16 K=2 no-remat", 16, 2, {"remat": False}, BHCL),
    ("bs8 K=2 no-remat", 8, 2, {"remat": False}, BHCL),
    ("bs16 K=2 blhc no-remat", 16, 2, {"remat": False}, BLHC),
    ("bs8 K=4 blhc no-remat", 8, 4, {"remat": False}, BLHC),
    ("bs32 K=2 blhc", 32, 2, {}, BLHC),
]


def run_cell(idx: int) -> None:
    label, batch, k, kw, env = CELLS[idx]
    os.environ.update(env)
    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    from underwater_image_restoration_tpu.train.benchlib import (
        time_train_step,
    )

    r = time_train_step("SpectralTransformer", 256, batch, steps=8,
                        windows=2, n_batches=1, k_steps=k, **kw)
    print(f"{label:28s} {r:9.1f} img/s", flush=True)


def main():
    here = os.path.abspath(__file__)
    indices = list(range(len(CELLS)))
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        indices = [int(x) for x in sys.argv[2].split(",")]
    for idx in indices:
        label = CELLS[idx][0]
        for attempt in range(3):
            try:
                res = subprocess.run(
                    [sys.executable, here, "--cell", str(idx)],
                    capture_output=True, text=True, timeout=1500)
                rc, out = res.returncode, (res.stdout or "").strip()
                tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            except subprocess.TimeoutExpired:
                rc, out, tail = -9, "", ["subprocess timeout"]
            if rc == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            print(f"# {label}: attempt {attempt + 1} rc={rc} "
                  f"{tail[0][:110]}", flush=True)
            if "PrescreenOOM" in tail[0]:
                break
            time.sleep(45)
        else:
            print(f"{label:28s} FAILED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell(int(sys.argv[2]))
    else:
        main()

#!/usr/bin/env python
"""A/B the MDTA data layout on hardware (honest value-fetch harness).

Round-3 attribution: the 8 full-res blocks (C=16/32 @ 256²) are ~77% of the
Spectral train step, and the lane-padding + FFT microbenches cleared those
suspects — leaving the per-MDTA physical transposes (the ``heads``
rearrange moves the lane dim from C to L, 8 full-tensor strided HBM passes
per block) and the LN/elementwise chain.  ``UIRT_ATTN_LAYOUT=blhc`` splits
heads by pure reshape and contracts attention over L in place; this script
prices it against the torch-shaped ``bhcl`` layout.

Usage: python experiments/ab_attn_layout.py [--cell i]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, SIZE, K = 16, 256, 2

CELLS = [
    ("bhcl (torch-shaped)", {"UIRT_ATTN_LAYOUT": "bhcl"}),
    ("blhc (spatial-major)", {"UIRT_ATTN_LAYOUT": "blhc"}),
]


def run_cell(idx: int) -> None:
    label, env = CELLS[idx]
    os.environ.update(env)
    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    from underwater_image_restoration_tpu.train.benchlib import (
        time_train_step,
    )

    r = time_train_step("SpectralTransformer", SIZE, BATCH, steps=8,
                        windows=2, n_batches=1, k_steps=K)
    print(f"{label:24s} {r:9.1f} img/s", flush=True)


def main():
    here = os.path.abspath(__file__)
    for idx, (label, _) in enumerate(CELLS):
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
            time.sleep(45)
        else:
            print(f"{label:24s} FAILED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell(int(sys.argv[2]))
    else:
        main()

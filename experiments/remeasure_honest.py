"""Honest re-measurement of every headline cell with the fixed harness.

Rounds 1-2 numbers were enqueue-rate artifacts (PERF_NOTES.md "THE
MEASUREMENT BUG"): block_until_ready through the axon tunnel acks the
dispatch enqueue, so timing windows closed before the chip finished.
benchlib now closes windows with a host value fetch; this script re-runs
the cells all recorded claims were built on, plus the A/B cells the fix
makes newly decidable:

- K-steps-per-dispatch: with honest timing the expected win is the ~5 ms
  enqueue per dispatch relative to the REAL step time (tens of ms), i.e.
  10-30%, not 27x.
- remat on/off: per-block remat recomputes the forward in the backward
  (~+15% flops); with honest timing, a smaller no-remat batch may win.
- shift-MAC vs lax depthwise conv (UIRT_DWCONV_LAX=1).

Usage: python experiments/remeasure_honest.py  (on the TPU)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CELLS = [
    # (label, arch, kwargs, size, batch, K, env)
    # bs64 no longer fits with the shift-MAC depthwise (static HBM
    # requirement 29.6G > 15.75G — the 9 shifted copies inflate remat
    # buffers); bs64 DOES fit via UIRT_DWCONV_LAX but measured 24.4 img/s
    # (the dense grouped-conv filter-grad is REAL compute on TPU, not a
    # counting artifact — chip calibrated healthy at 111 TFLOP/s the same
    # minute).  Headline candidates are therefore bs32 shift-MAC cells.
    ("Spectral@256 bs32 K=1", "SpectralTransformer", {}, 256, 32, 1, {}),
    ("Spectral@256 bs32 K=8", "SpectralTransformer", {}, 256, 32, 8, {}),
    ("Spectral@256 bs32 K=8 laxdw", "SpectralTransformer", {}, 256, 32, 8,
     {"UIRT_DWCONV_LAX": "1"}),
    ("Spectral@256 bs32 K=8 no-remat", "SpectralTransformer",
     {"remat": False}, 256, 32, 8, {}),
    # remat_policy="mxu" saves dot/conv/FFT outputs: ~remat=False flops with
    # most of remat's HBM savings.
    ("Spectral@256 bs32 K=8 pol=mxu", "SpectralTransformer",
     {"remat_policy": "mxu"}, 256, 32, 8, {}),
    # flop-level A/B says mxu+ew is slightly WORSE (reduce_precision pairs
    # on saved residuals outweigh the removed recompute — PERF_NOTES.md);
    # hardware decides whether rp is actually elided at runtime
    ("Spectral@256 bs32 K=8 pol=mxu+ew", "SpectralTransformer",
     {"remat_policy": "mxu+ew"}, 256, 32, 8, {}),
    ("Spectral@256 bs16 fflMix K=8", "SpectralTransformer",
     {"lossf": "fflMix"}, 256, 16, 8, {}),
    # round-1's "Pallas == XLA end-to-end" verdict came from enqueue-rate
    # timing — re-decide it honestly
    ("AST@256 bs32 K=8", "AST", {}, 256, 32, 8, {}),
    ("AST@256 bs32 K=8 pallas", "AST", {}, 256, 32, 8,
     {"UIRT_PALLAS": "1"}),
    # exact-GELU erf is a large VPU cost in the flop attribution
    # (hlo_breakdown: AST mlp/erfc 124 GFLOP/img on the CPU lowering);
    # tanh-approx A/B decides whether erf matters on the TPU VPU
    ("AST@256 bs32 K=8 fastgelu", "AST", {}, 256, 32, 8,
     {"UIRT_FAST_GELU": "1"}),
    ("NewModel-W@256 bs16 K=8", "NewModel", {"use_dwt": "Wavelet"}, 256, 16,
     8, {}),
    ("NewBigModel@512 bs4 K=8", "NewBigModel", {"use_dwt": "Wavelet"}, 512,
     4, 8, {"UIRT_NO_PALLAS": "1"}),
    ("Spectral@1024 bs1 K=8", "SpectralTransformer", {}, 1024, 1, 8, {}),
    # appended after launch (run with --only): UIRT_DWCONV=hybrid keeps the
    # single-conv forward (fits bs64) with the cheap hand-written backward
    ("Spectral@256 bs32 K=8 hybrid", "SpectralTransformer", {}, 256, 32, 8,
     {"UIRT_DWCONV": "hybrid"}),
    ("Spectral@256 bs64 K=8 hybrid", "SpectralTransformer", {}, 256, 64, 8,
     {"UIRT_DWCONV": "hybrid"}),
    ("AST@256 bs32 K=8 hybrid", "AST", {}, 256, 32, 8,
     {"UIRT_DWCONV": "hybrid"}),
]


def _enable_cache():
    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)


def run_one_cell(idx: int) -> None:
    """Run a single cell (or the inference cell, idx=-1) in THIS process.

    One RESOURCE_EXHAUSTED can wedge the remote tunnel for the rest of the
    process (observed: every later cell OOMs even at trivial sizes), so the
    sweep driver spawns each cell in a fresh subprocess instead of looping
    in-process."""
    from underwater_image_restoration_tpu.train.benchlib import (
        time_infer,
        time_train_step,
    )

    _enable_cache()
    if idx < 0:
        for ib in (256, 64):
            try:
                r = time_infer("SpectralTransformer", 256, ib, steps=8,
                               windows=2)
                print(f"{'infer Spectral@256 bs%d' % ib:32s} {r:9.1f} img/s",
                      flush=True)
                return
            except Exception as e:
                print(f"infer bs{ib} FAILED {type(e).__name__}", flush=True)
        raise SystemExit(1)

    label, arch, kw, size, batch, k, env = CELLS[idx]
    os.environ.update(env)
    # `steps` = DISPATCHES per window; keep ~constant images/window
    r = time_train_step(arch, size, batch, steps=max(2, 32 // k),
                        windows=2, n_batches=2, k_steps=k, **kw)
    print(f"{label:32s} {r:9.1f} img/s", flush=True)


def main():
    """Sweep driver: one subprocess per cell, retrying transient failures.

    HTTP 500 from the remote compile helper and tunnel-wedge OOM cascades
    are both transient (shared compile host / shared chip); genuine
    doesn't-fit OOMs are not, but retrying those twice only costs minutes."""
    import subprocess
    import time

    here = os.path.abspath(__file__)
    indices = list(range(len(CELLS))) + [-1]
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        indices = [int(x) for x in sys.argv[2].split(",")]
    for idx in indices:
        label = CELLS[idx][0] if idx >= 0 else "infer"
        for attempt in range(3):
            res = subprocess.run(
                [sys.executable, here, "--cell", str(idx)],
                capture_output=True, text=True, timeout=1800,
            )
            out = (res.stdout or "").strip()
            if res.returncode == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            print(f"# {label}: attempt {attempt + 1} rc={res.returncode} "
                  f"{tail[0][:110]}", flush=True)
            time.sleep(60)
        else:
            print(f"{label:32s} FAILED after 3 attempts", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_one_cell(int(sys.argv[2]))
    else:
        main()

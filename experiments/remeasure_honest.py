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

# K-rethink under honest timing: real step times are tens of ms, so the
# ~5 ms enqueue round-trip is a 5-15% overhead at K=1 — and each K unit of
# a K-step dispatch costs a full stacked uint8 input pair in HBM
# (bs32@256: 400 MB/K-unit; the compile-only prescreen measured bs32 K=8
# shift at 16.5 GB static > 15 GB budget).  So the candidate grid is small
# K (1/2/4), not the K=32 of the enqueue-rate era.
HYB = {"UIRT_DWCONV": "hybrid"}
LAX = {"UIRT_DWCONV": "lax"}

CELLS = [
    # (label, arch, kwargs, size, batch, K, env)
    # -- dwconv-mode A/B at a batch where every mode fits (bs16) ---------
    # (the compile-only prescreen measured bs32 SHIFT at 16.4 GB static >
    # the 15.75 GB chip — the shift lowering's kh*kw shifted copies under
    # remat push bs32 out; hybrid keeps the single-conv forward and fits)
    ("Spectral@256 bs16 K=2 shift", "SpectralTransformer", {}, 256, 16, 2,
     {}),
    ("Spectral@256 bs16 K=2 hybrid", "SpectralTransformer", {}, 256, 16, 2,
     HYB),
    ("Spectral@256 bs16 K=2 laxdw", "SpectralTransformer", {}, 256, 16, 2,
     LAX),
    # -- batch/K grid under hybrid (the HBM-lean mode) --------------------
    ("Spectral@256 bs32 K=1 hybrid", "SpectralTransformer", {}, 256, 32, 1,
     HYB),
    ("Spectral@256 bs32 K=2 hybrid", "SpectralTransformer", {}, 256, 32, 2,
     HYB),
    ("Spectral@256 bs32 K=4 hybrid", "SpectralTransformer", {}, 256, 32, 4,
     HYB),
    ("Spectral@256 bs64 K=1 hybrid", "SpectralTransformer", {}, 256, 64, 1,
     HYB),
    ("Spectral@256 bs64 K=2 hybrid", "SpectralTransformer", {}, 256, 64, 2,
     HYB),
    # -- remat family under hybrid at bs32 --------------------------------
    ("Spectral@256 bs32 K=2 hybrid no-remat", "SpectralTransformer",
     {"remat": False}, 256, 32, 2, HYB),
    ("Spectral@256 bs32 K=2 hybrid pol=mxu", "SpectralTransformer",
     {"remat_policy": "mxu"}, 256, 32, 2, HYB),
    ("Spectral@256 bs32 K=2 hybrid pol=mxu+ew", "SpectralTransformer",
     {"remat_policy": "mxu+ew"}, 256, 32, 2, HYB),
    ("Spectral@256 bs64 K=2 hybrid pol=mxu", "SpectralTransformer",
     {"remat_policy": "mxu"}, 256, 64, 2, HYB),
    # -- loss family ------------------------------------------------------
    ("Spectral@256 bs16 fflMix K=2 hybrid", "SpectralTransformer",
     {"lossf": "fflMix"}, 256, 16, 2, HYB),
    # -- zoo + levers -----------------------------------------------------
    ("AST@256 bs32 K=2", "AST", {}, 256, 32, 2, {}),
    ("AST@256 bs32 K=2 hybrid", "AST", {}, 256, 32, 2, HYB),
    # round-1's "Pallas == XLA end-to-end" verdict came from enqueue-rate
    # timing — re-decide it honestly
    ("AST@256 bs32 K=2 pallas", "AST", {}, 256, 32, 2, {"UIRT_PALLAS": "1"}),
    # exact-GELU erf is a large VPU cost in the flop attribution
    # (hlo_breakdown: AST mlp/erfc 124 GFLOP/img on the CPU lowering);
    # tanh-approx A/B decides whether erf matters on the TPU VPU
    ("AST@256 bs32 K=2 fastgelu", "AST", {}, 256, 32, 2,
     {"UIRT_FAST_GELU": "1"}),
    ("NewModel-W@256 bs16 K=2 hybrid", "NewModel", {"use_dwt": "Wavelet"},
     256, 16, 2, HYB),
    ("NewBigModel@512 bs4 K=2 hybrid", "NewBigModel", {"use_dwt": "Wavelet"},
     512, 4, 2, dict(HYB, UIRT_NO_PALLAS="1")),
    ("Spectral@1024 bs1 K=2 hybrid", "SpectralTransformer", {}, 1024, 1, 2,
     HYB),
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
    # `steps` = DISPATCHES per window; keep ~constant images/window.
    # n_batches=1 when K>1: each extra rotated pair costs K x batch of
    # uint8 HBM, and timing is data-independent anyway.
    r = time_train_step(arch, size, batch, steps=max(4, 16 // k),
                        windows=2, n_batches=1 if k > 1 else 2, k_steps=k,
                        **kw)
    print(f"{label:40s} {r:9.1f} img/s", flush=True)


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
            try:
                res = subprocess.run(
                    [sys.executable, here, "--cell", str(idx)],
                    capture_output=True, text=True, timeout=1800,
                )
                rc, out = res.returncode, (res.stdout or "").strip()
                tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            except subprocess.TimeoutExpired:
                # a wedged tunnel cell is exactly the failure mode the
                # per-cell subprocess exists to survive — count it as a
                # failed attempt, don't abort the sweep
                rc, out, tail = -9, "", ["subprocess timeout (1800s)"]
            if rc == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            print(f"# {label}: attempt {attempt + 1} rc={rc} "
                  f"{tail[0][:110]}", flush=True)
            if "PrescreenOOM" in tail[0]:
                print(f"{label:40s} SKIPPED ({tail[0].split(':')[-1].strip()})",
                      flush=True)
                break  # compile-only static can't-fit: deterministic
            time.sleep(60)
        else:
            print(f"{label:32s} FAILED after 3 attempts", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_one_cell(int(sys.argv[2]))
    else:
        main()

"""Per-arch logical train-step FLOPs and v5e roofline bounds (CPU compile).

Context for the honest re-measurement (PERF_NOTES.md "THE MEASUREMENT
BUG"): dividing the v5e's peak rates by a train step's per-image FLOPs
bounds the throughput any honest timing can report.  The aggregate
``cost_analysis`` number is the WRONG numerator for an MXU bound, for two
reasons found by hlo_breakdown.py:

- it mixes MXU work (dot/conv) with VPU elementwise work — different
  peak rates (~197 vs ~6 TFLOP/s on v5e);
- the CPU backend expands transcendentals (exact-GELU erf → a ~30-op
  erfc polynomial) so the elementwise share is inflated vs the TPU
  lowering (AST@256: 124 of 205 elementwise GFLOP/img is erfc expansion).

So this reports a two-resource roofline: the MXU bound from the
dot+conv+fft skeleton, the VPU bound from the elementwise count (upper
estimate — includes the CPU-expansion inflation), and min(mxu, vpu).

v5e peaks: 197 bf16 TFLOP/s MXU (4×128×128 MACs).  VPU estimated as
1024 lanes × 4 ALUs × ~1.5 GHz ≈ 6 T op/s f32 (order-of-magnitude; the
published spec gives no VPU number).

Runs entirely on CPU (compile only, no execution) — usable while the TPU
tunnel is down.  HLO texts are cached under /tmp (see
hlo_breakdown.compile_cached).  Usage: python experiments/flops_roofline.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from hlo_breakdown import breakdown, compile_cached  # noqa: E402

V5E_BF16_TFLOPS = 197.0   # MXU peak
V5E_VPU_TFLOPS = 6.0      # VPU estimate (see module docstring)

CELLS = [
    ("SpectralTransformer@256", "SpectralTransformer", {}, 256, 2),
    ("AST@256", "AST", {}, 256, 2),
    ("NewModel-Wavelet@256", "NewModel", {"use_dwt": "Wavelet"}, 256, 2),
    ("NewBigModel@512", "NewBigModel", {"use_dwt": "Wavelet"}, 512, 1),
    ("SpectralTransformer@1024", "SpectralTransformer", {}, 1024, 1),
]


def main():
    print(f"{'cell':28s} {'total':>8s} {'mxu':>8s} {'ew':>8s} "
          f"{'mxu i/s':>8s} {'vpu i/s':>8s} {'bound':>8s}   (GFLOP/img)")
    for label, arch, kw, size, batch in CELLS:
        try:
            hlo, agg = compile_cached(arch, size, batch, **kw)
            cat, _, _, _ = breakdown(hlo, with_elementwise=True)
            mxu_f = (cat.get("dot", 0) + cat.get("convolution", 0)
                     + cat.get("fft", 0)) / batch
            ew_f = cat.get("elementwise", 0) / batch
            mxu = V5E_BF16_TFLOPS * 1e12 / mxu_f if mxu_f else float("inf")
            vpu = V5E_VPU_TFLOPS * 1e12 / ew_f if ew_f else float("inf")
            print(f"{label:28s} {agg / batch / 1e9:8.1f} "
                  f"{mxu_f / 1e9:8.1f} {ew_f / 1e9:8.1f} "
                  f"{mxu:8.0f} {vpu:8.0f} {min(mxu, vpu):8.0f}", flush=True)
        except Exception as e:
            print(f"{label:28s} FAILED {type(e).__name__}: {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    main()

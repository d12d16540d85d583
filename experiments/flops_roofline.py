"""Per-arch logical train-step FLOPs and v5e roofline bounds (CPU compile).

Context for the honest re-measurement (PERF_NOTES.md "THE MEASUREMENT
BUG"): ``cost_analysis`` of each arch's fused train step gives a logical
FLOP count per image; dividing the v5e's peak rates by it bounds the
throughput any honest timing can report.  Numbers are *logical* flops as
XLA counts them (the depthwise shift-MAC lowering makes fwd+bwd ~linear
in the forward; see ops/layers.py), so the bound is loose only by MXU
utilization, not by the 40x grouped-conv-backward overcount.

Runs entirely on CPU (compile only, no execution) — usable while the TPU
tunnel is down.  Usage: python experiments/flops_roofline.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

V5E_BF16_TFLOPS = 197.0   # MXU peak
V5E_HBM_GBPS = 819.0      # HBM bandwidth

CELLS = [
    ("SpectralTransformer@256", "SpectralTransformer", {}, 256, 8),
    ("AST@256", "AST", {}, 256, 8),
    ("NewModel-Wavelet@256", "NewModel", {"use_dwt": "Wavelet"}, 256, 4),
    ("NewBigModel@512", "NewBigModel", {"use_dwt": "Wavelet"}, 512, 1),
    ("SpectralTransformer@1024", "SpectralTransformer", {}, 1024, 1),
]


def main():
    from underwater_image_restoration_tpu.train.benchlib import (
        TrainStepBench,
    )

    print(f"{'cell':28s} {'GFLOP/img':>10s} {'GB/img':>8s} "
          f"{'mxu img/s':>10s} {'hbm img/s':>10s}")
    for label, arch, kw, size, batch in CELLS:
        try:
            b = TrainStepBench(arch, size, batch, **kw)
            raw, ref = b.batches[0]
            lowered = b.step.lower(b.state, raw, ref, b.rng)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) / batch
            byts = float(cost.get("bytes accessed", 0.0)) / batch
            mxu = V5E_BF16_TFLOPS * 1e12 / flops if flops else float("inf")
            hbm = V5E_HBM_GBPS * 1e9 / byts if byts else float("inf")
            print(f"{label:28s} {flops / 1e9:10.1f} {byts / 1e9:8.2f} "
                  f"{mxu:10.0f} {hbm:10.0f}", flush=True)
        except Exception as e:
            print(f"{label:28s} FAILED {type(e).__name__}: {str(e)[:80]}",
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Price XLA's native FFT against a matmul (MXU) DFT on the TPU.

The Spectral models call full-spatial fft2/ifft2 in every block (MDTA
frequency branch, reference SpectralTransformer.py:102-113) and every
up-sampler (:161-188).  XLA lowers jnp.fft.* on TPU through a generic FFT
that does not use the MXU; for the FIXED, SMALL spatial sizes this zoo uses
(256/128/64/32 per U-Net level), a dense DFT-matrix contraction is
MXU-shaped: fft2(x) == DFT_H @ x @ DFT_W^T, 6 real matmuls per complex
transform (real input: 2 for the H side, 4 for the W side).

This microbench times, per representative (B,H,W,C) level shape:
  - native:  jnp.fft.fft2 (complex64) -> real (the MDTA branch's use)
  - matmul:  f32 DFT-matrix einsum pair (same math, MXU)
both through the honest value-fetch harness (chain the op on itself so a
window of N iterations is data-dependent end-to-end).

Run AFTER any other chip workload finishes (shared-chip contention).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [
    (16, 256, 256, 16),   # Spectral@256 level-0 (bs16)
    (16, 128, 128, 32),   # level-1
    (16, 64, 64, 64),     # level-2
    (16, 32, 32, 128),    # level-3
]


def dft_mats(n: int):
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    for shape in SHAPES:
        b, h, w, c = shape
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            shape).astype(np.float32))

        @jax.jit
        def native(x):
            # real(fft2) -> feed back (the MDTA branch's real-only use)
            for _ in range(8):
                f = jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2))
                x = jnp.real(f) * (1.0 / (h * w)) + x * 1e-6
            return x

        hr, hi = (jnp.asarray(a) for a in dft_mats(h))
        wr, wi = (jnp.asarray(a) for a in dft_mats(w))

        @jax.jit
        def matmul(x):
            for _ in range(8):
                # Y = DFT_H @ x  (x real): yr/yi over axis 1
                yr = jnp.einsum("hH,bHwc->bhwc", hr, x)
                yi = jnp.einsum("hH,bHwc->bhwc", hi, x)
                # Z = Y @ DFT_W^T over axis 2; real part only
                zr = (jnp.einsum("wW,bhWc->bhwc", wr, yr)
                      - jnp.einsum("wW,bhWc->bhwc", wi, yi))
                x = zr * (1.0 / (h * w)) + x * 1e-6
            return x

        # parity check once (CPU-free: compare on device, fetch scalar)
        f_native = jnp.real(jnp.fft.fft2(x.astype(jnp.complex64),
                                         axes=(1, 2)))
        yr = jnp.einsum("hH,bHwc->bhwc", hr, x)
        yi = jnp.einsum("hH,bHwc->bhwc", hi, x)
        f_mm = (jnp.einsum("wW,bhWc->bhwc", wr, yr)
                - jnp.einsum("wW,bhWc->bhwc", wi, yi))
        err = float(jnp.max(jnp.abs(f_native - f_mm))
                    / (1e-6 + jnp.max(jnp.abs(f_native))))
        for name, fn in (("native", native), ("matmul", matmul)):
            out = fn(x)
            np.asarray(out[0, 0, 0, :1])  # compile + settle
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(x)
                np.asarray(out[0, 0, 0, :1])
                best = min(best, time.perf_counter() - t0)
            us = best / 8 * 1e6
            print(f"{shape} {name:7s} {us:9.1f} us/fft2  (rel err {err:.2e})",
                  flush=True)


if __name__ == "__main__":
    main()

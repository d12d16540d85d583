#!/usr/bin/env python
"""Calibrate the chip: achievable HBM stream bandwidth + MXU matmul rate.

The round-3 honest numbers sit ~25-90x under the MXU roofline and the
LN-chain microbench ran at 14-63 GB/s effective — far under the v5e's
~819 GB/s spec.  Before optimizing layouts/kernels, this measures what the
hardware (through the axon tunnel) actually sustains on the simplest
possible workloads, one fused op per dispatch:

- stream: y = 2*x + 1 over a large array (read+write, zero compute) at
  several sizes/dtypes -> effective GB/s.
- reduce: jnp.sum(x) (read-only) -> GB/s.
- matmul: (8192x8192) @ (8192x8192) bf16 -> TFLOP/s (MXU calibration).

Honest harness: each timing window is closed by a host fetch of a value
that data-depends on the work.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=6):
    out = fn(*args)
    np.asarray(jax_fetch(out))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax_fetch(out))
        best = min(best, time.perf_counter() - t0)
    return best


def jax_fetch(x):
    # fetch one scalar that depends on the result (sum for arrays)
    import jax.numpy as jnp

    return x if x.ndim == 0 else x.ravel()[0]


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    for dtype, mb in ((jnp.bfloat16, 512), (jnp.bfloat16, 2048),
                      (jnp.float32, 2048)):
        n = mb * 2**20 // np.dtype(
            np.float32 if dtype == jnp.float32 else np.float16).itemsize
        x = jnp.ones((n,), dtype)

        stream = jax.jit(lambda x: 2.0 * x + 1.0)
        t = _time(stream, x)
        print(f"stream {mb:5d} MB {jnp.dtype(dtype).name:9s}"
              f" {2 * x.nbytes / t / 1e9:7.1f} GB/s", flush=True)

        red = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
        t = _time(red, x)
        print(f"reduce {mb:5d} MB {jnp.dtype(dtype).name:9s}"
              f" {x.nbytes / t / 1e9:7.1f} GB/s", flush=True)

    m = 8192
    a = jnp.ones((m, m), jnp.bfloat16)
    b = jnp.ones((m, m), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    t = _time(mm, a, b)
    print(f"matmul {m}^3 bf16 {2 * m**3 / t / 1e12:7.1f} TFLOP/s", flush=True)

    # the model's actual inner shape: full-res NHWC elementwise at C=16
    x = jnp.ones((16, 256, 256, 16), jnp.bfloat16)
    t = _time(jax.jit(lambda x: 2.0 * x + 1.0), x)
    print(f"stream (16,256,256,16) bf16 {2 * x.nbytes / t / 1e9:7.1f} GB/s",
          flush=True)


if __name__ == "__main__":
    main()

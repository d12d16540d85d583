#!/usr/bin/env python
"""Directly price NHWC lane padding at the Spectral zoo's channel widths.

XLA-TPU tiles the two minor dims to (sublane, lane) = (8/16, 128); an NHWC
activation with C<128 pads the lane dim (C=16 -> 8x for f32, bf16 tiles
(16,128) so also 8x).  Every elementwise/LN/norm pass over a full-res
(B,256,256,16) tensor then moves 8x the useful bytes — if true, the
Spectral step is padding-bandwidth-bound, not MXU- or flop-bound.

Times an 8-deep chain of {mul-add, LayerNorm-like normalize} passes over
the SAME byte count arranged two ways:
  - nhwc:  (B, 256, 256, C)      — lane dim C (padded when C<128)
  - packed:(B, 256, 256/k, C*k)  — lane dim 128 exactly
If padding is real, nhwc time should be ~128/C x packed time for the same
logical bytes.

Honest harness: window closed by a host value fetch.  Run only when the
chip is otherwise idle.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    B = 16
    for c in (16, 32, 64, 128):
        k = 128 // c
        for label, shape in (
            ("nhwc", (B, 256, 256, c)),
            ("packed", (B, 256, 256 // k, 128)),
        ):
            x = jnp.asarray(np.random.default_rng(0).standard_normal(
                shape).astype(np.float32)).astype(jnp.bfloat16)

            @jax.jit
            def chain(x):
                for _ in range(8):
                    m = jnp.mean(x.astype(jnp.float32), axis=-1,
                                 keepdims=True)
                    v = jnp.mean(jnp.square(
                        x.astype(jnp.float32) - m), axis=-1, keepdims=True)
                    x = ((x.astype(jnp.float32) - m)
                         * jax.lax.rsqrt(v + 1e-6) * 1.0009 + 1e-7
                         ).astype(jnp.bfloat16)
                return x

            out = chain(x)
            np.asarray(out[0, 0, 0, :1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = chain(x)
                np.asarray(out[0, 0, 0, :1])
                best = min(best, time.perf_counter() - t0)
            byt = np.prod(shape) * 2 * 2 * 8  # rd+wr per pass, 8 passes
            print(f"C={c:3d} {label:6s} {best/8*1e3:8.2f} ms/pass  "
                  f"eff-bw {byt/best/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()

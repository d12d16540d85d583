#!/usr/bin/env python
"""Price a ±1-lane-misaligned VMEM slice read against an aligned one.

The fused kernels' 9-tap stack builders and transposed-shift scatters do
6 misaligned (C, n) slice ops each (offsets ±1 lane); UIRT_KABL pricing
puts stack+scatter at ~30% of the banded kernels.  The aligned-frames
restructuring (build one shifted frame per direction, then only aligned
slices) is worth its complexity ONLY if Mosaic's misalignment penalty is
substantially more than 1x — this bench measures exactly that penalty on
a (C, P + n) buffer: R repeated slice-copy(+mask) passes at offset 0
(aligned), offset 1 (misaligned), and offset 1 via a pre-shifted frame
(one misaligned build + R aligned).

Usage: python experiments/misalign_microbench.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C, N, PAD = 128, 4096, 36 * 128 + 256
R = 36   # slice ops per kernel call (~ one bwd chunk's tap traffic)


def main():
    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.default_backend() == "cpu"

    def make(offset: int, framed: bool, masked: bool):
        def kernel(x_ref, o_ref, buf, frame):
            mask = None
            if masked:
                col = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % 256
                mask = (col != 0).astype(x_ref.dtype)
            buf[:, pl.ds(0, N)] = x_ref[:]
            buf[:, pl.ds(N, PAD)] = jnp.zeros((C, PAD), x_ref.dtype)
            # distinct offsets per r so Mosaic cannot CSE the slices
            if framed:
                # one misaligned build, then R aligned slices
                fr = buf[:, pl.ds(offset, N + R * 128)]
                if masked:
                    colf = jax.lax.broadcasted_iota(
                        jnp.int32, (1, N + R * 128), 1) % 256
                    fr = fr * (colf != 0).astype(x_ref.dtype)
                frame[:] = fr
                acc = jnp.zeros((C, N), jnp.float32)
                for r in range(R):
                    sl = frame[:, pl.ds(r * 128, N)]
                    acc = acc + sl.astype(jnp.float32)
            else:
                acc = jnp.zeros((C, N), jnp.float32)
                for r in range(R):
                    sl = buf[:, pl.ds(offset + r * 128, N)]
                    if mask is not None:
                        sl = sl * mask
                    acc = acc + sl.astype(jnp.float32)
            o_ref[:] = acc.astype(x_ref.dtype)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((C, N + PAD), jnp.bfloat16),
                            pltpu.VMEM((C, N + R * 128), jnp.bfloat16)],
            interpret=interp,
        )
        return jax.jit(f)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, N)),
                    jnp.bfloat16)

    # scan-chain difference timing (op_microbench method): the tunnel's
    # ~5 ms per-dispatch enqueue round-trip swamps a μs kernel, so time
    # one dispatch of L1 vs L2 chained calls and difference them.
    L1, L2 = 64, 512

    def best(fn, windows=8):
        def chain(length):
            @jax.jit
            def run(z):
                def body(carry, _):
                    return fn(carry), None

                out, _ = jax.lax.scan(body, z, None, length=length)
                return out

            return run

        f2 = chain(L2)
        float(np.asarray(f2(x)).ravel()[0])
        b = 1e30
        for _ in range(windows):
            t0 = time.perf_counter()
            float(np.asarray(f2(x)).ravel()[0])
            b = min(b, (time.perf_counter() - t0) / L2)
        return b * 1e6

    for label, off, framed, masked in (
            ("aligned       ", 0, False, False),
            ("aligned+mask  ", 0, False, True),
            ("misaligned    ", 1, False, False),
            ("misaligned+msk", 1, False, True),
            ("framed(+1)    ", 1, True, False),
            ("framed(+1)+msk", 1, True, True)):
        t = best(make(off, framed, masked))
        print(f"{label} {t:8.1f} us/call ({R} slice ops)", flush=True)


if __name__ == "__main__":
    main()

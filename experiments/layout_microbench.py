#!/usr/bin/env python
"""Lane-padding bytes test: does NHWC C=16 stream like C=128?

bf16 arrays tile the two minor dims as (16, 128) sublanes x lanes; an NHWC
full-res activation (B, 256, 256, 16) therefore pads the lane dim 8x.  If
HBM traffic scales with PADDED bytes, the honest attribution's "full-res
blocks are 77% of the step" is a padding tax, and a channel-major
(B, C, H, W) layout (minor dims 256x256, zero pad) deletes it.

Method: in-dispatch scan chains differenced at two lengths
(op_microbench.py technique — cancels the ~27 ms host value-fetch
round-trip).  Each case is one shape-preserving op chained on a carry that
exceeds VMEM, so every iteration streams the carry HBM->VPU->HBM.

Cases (all bf16, B=16):
  A. saxpy       NHWC (B,256,256,16)   vs CHW-major (B,16,256,256)
                 vs NHWC C=128 control (8x logical bytes)
  B. LayerNorm   over lanes (NHWC) vs over the C axis (CHW-major)
  C. 1x1 conv C->84->C   lax conv NHWC vs einsum CHW-major
  D. dw3x3       shift-MAC NHWC vs shift-MAC CHW-major

Prediction if padding is real: A-nhwc16 ~= A-nhwc128 (same physical bytes)
and A-chw ~= A-nhwc16 / 8.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 16, 256, 256, 16
N1, N2 = 8, 24


def build_cases():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x_nhwc = jax.random.normal(key, (B, H, W, C), dt)
    x_chw = jax.random.normal(key, (B, C, H, W), dt)
    x_fat = jax.random.normal(key, (B, H, W, 128), dt)

    def saxpy(c):
        return (c * jnp.asarray(1.0001, dt) + jnp.asarray(0.01, dt)
                - jnp.asarray(0.01, dt))

    def ln(axis):
        def f(c):
            xf = c.astype(jnp.float32)
            m = jnp.mean(xf, axis=axis, keepdims=True)
            v = jnp.mean(jnp.square(xf - m), axis=axis, keepdims=True)
            return ((xf - m) * jax.lax.rsqrt(v + 1e-5)).astype(c.dtype)
        return f

    w_up = jax.random.normal(jax.random.PRNGKey(1), (C, 84), dt) * 0.1
    w_dn = jax.random.normal(jax.random.PRNGKey(2), (84, C), dt) * 0.1

    def conv1x1_nhwc(c):
        y = jax.lax.dot_general(
            c, w_up, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(c.dtype)
        return jax.lax.dot_general(
            y, w_dn, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(c.dtype)

    def conv1x1_chw(c):
        y = jnp.einsum("bchw,cd->bdhw", c, w_up,
                       preferred_element_type=jnp.float32).astype(c.dtype)
        return jnp.einsum("bdhw,dc->bchw", y, w_dn,
                          preferred_element_type=jnp.float32).astype(c.dtype)

    kdw = jax.random.normal(jax.random.PRNGKey(3), (3, 3, C), dt) * 0.2

    def dw_nhwc(c):
        xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = None
        for dh in range(3):
            for dw in range(3):
                t = (xp[:, dh:dh + H, dw:dw + W, :]
                     * kdw[dh, dw]).astype(jnp.float32)
                y = t if y is None else y + t
        return y.astype(c.dtype)

    def dw_chw(c):
        xp = jnp.pad(c, ((0, 0), (0, 0), (1, 1), (1, 1)))
        k = kdw.transpose(2, 0, 1)  # (C, 3, 3)
        y = None
        for dh in range(3):
            for dw in range(3):
                t = (xp[:, :, dh:dh + H, dw:dw + W]
                     * k[None, :, dh, dw, None, None]).astype(jnp.float32)
                y = t if y is None else y + t
        return y.astype(c.dtype)

    return [
        ("saxpy nhwc C=16", x_nhwc, saxpy),
        ("saxpy chw-major", x_chw, saxpy),
        ("saxpy nhwc C=128 (8x data)", x_fat, saxpy),
        ("LN nhwc over C", x_nhwc, ln(-1)),
        ("LN chw over C(ax1)", x_chw, ln(1)),
        ("1x1 C-84-C nhwc", x_nhwc, conv1x1_nhwc),
        ("1x1 C-84-C chw", x_chw, conv1x1_chw),
        ("dw3x3 shift nhwc", x_nhwc, dw_nhwc),
        ("dw3x3 shift chw", x_chw, dw_chw),
    ]


def run_case(idx: int) -> None:
    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    cases = build_cases()
    name, x, f = cases[idx]

    def chain(n):
        @jax.jit
        def run(x0):
            y, _ = jax.lax.scan(lambda c, _: (f(c), None), x0, length=n)
            return jnp.sum(y.astype(jnp.float32))
        return run

    times = {}
    for n in (N1, N2):
        run = chain(n)
        float(run(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_iter = (times[N2] - times[N1]) / (N2 - N1)
    gbps = 2 * x.size * x.dtype.itemsize / per_iter / 1e9  # logical rd+wr
    print(f"{name:30s} {per_iter * 1e3:8.3f} ms/op  "
          f"({gbps:6.1f} GB/s logical)", flush=True)


def main():
    import subprocess

    here = os.path.abspath(__file__)
    n_cases = 9
    indices = list(range(n_cases))
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        indices = [int(i) for i in sys.argv[2].split(",")]
    for idx in indices:
        for attempt in range(2):
            try:
                res = subprocess.run(
                    [sys.executable, here, "--case", str(idx)],
                    capture_output=True, text=True, timeout=900)
                rc, out = res.returncode, (res.stdout or "").strip()
                tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            except subprocess.TimeoutExpired:
                rc, out, tail = -9, "", ["subprocess timeout"]
            if rc == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            print(f"# case {idx}: attempt {attempt + 1} rc={rc} "
                  f"{tail[0][:110]}", flush=True)
            time.sleep(20)
        else:
            print(f"case {idx} FAILED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        run_case(int(sys.argv[2]))
    else:
        main()

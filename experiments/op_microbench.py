#!/usr/bin/env python
"""Per-op honest timing via in-dispatch scan chains.

The host value-fetch round-trip is ~25-28 ms (hbm_microbench.py), so any
per-call microbench under ~100 ms is fetch-dominated.  This harness times
ops by scanning N shape-preserving applications inside ONE dispatch and
differencing two scan lengths (N2 - N1 cancels both the fetch overhead and
the chain's fixed ends): per_iter = (T(N2) - T(N1)) / (N2 - N1).

Target: decompose the full-res SpectralBlock cost (77% of the train step,
~36 ms/img at bs16) into per-op ms with shapes exactly as the model runs
them — (B, 256, 256, 16) bf16, GDFN hidden 84, MDTA heads=1.

Usage: python experiments/op_microbench.py [--only i,j]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W, C = 16, 256, 256, 16
N1, N2 = 8, 24


def build_cases():
    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.models.spectral_transformer import (
        GDFN, MDTA, SpectralBlock,
    )
    from underwater_image_restoration_tpu.ops import (
        Conv2d, LayerNorm, gelu, l2_normalize,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    dt = jnp.bfloat16

    def module_case(mod, train):
        params = mod.init(jax.random.PRNGKey(1), x)

        if train:
            def f(c):
                y, g = jax.value_and_grad(
                    lambda p, z: jnp.sum(mod.apply(p, z).astype(jnp.float32)),
                    argnums=(0, 1))(params, c)
                # fold the grad back into the carry so nothing is DCE'd
                return c + g[1].astype(c.dtype) * 1e-6
        else:
            def f(c):
                return mod.apply(params, c).astype(c.dtype)
        return f

    cases = []

    def add(name, f):
        cases.append((name, f))

    add("SpectralBlock fwd", module_case(
        SpectralBlock(C, 1, 2.66, dtype=dt), False))
    add("SpectralBlock fwd+bwd", module_case(
        SpectralBlock(C, 1, 2.66, dtype=dt), True))
    add("GDFN fwd", module_case(GDFN(C, 2.66, dtype=dt), False))
    add("GDFN fwd+bwd", module_case(GDFN(C, 2.66, dtype=dt), True))
    add("MDTA fwd", module_case(MDTA(C, 1, dtype=dt), False))
    add("MDTA fwd+bwd", module_case(MDTA(C, 1, dtype=dt), True))
    add("LayerNorm fwd", module_case(LayerNorm(dtype=dt), False))
    add("LayerNorm fwd+bwd", module_case(LayerNorm(dtype=dt), True))
    # paired 1x1 convs C->84->C (measures both directions of GDFN's
    # project_in/out)
    add("1x1 conv C->84->C fwd", module_case(
        _Seq84(dt, dwconv=False, gate=False), False))
    add("1x1 conv C->84->C fwd+bwd", module_case(
        _Seq84(dt, dwconv=False, gate=False), True))
    # + depthwise 3x3 at 84ch
    add("1x1+dw3x3@84 fwd", module_case(
        _Seq84(dt, dwconv=True, gate=False), False))
    add("1x1+dw3x3@84 fwd+bwd", module_case(
        _Seq84(dt, dwconv=True, gate=False), True))
    # full GDFN-equivalent chain for cross-checking
    add("1x1+dw+gelu-gate fwd+bwd", module_case(
        _Seq84(dt, dwconv=True, gate=True), True))

    # l2_normalize over L in the blhc layout
    def l2f(c):
        q = c.reshape(B, H * W, 1, C)
        return l2_normalize(q, axis=1).reshape(c.shape).astype(c.dtype)

    add("l2_normalize over L fwd", l2f)

    def l2g(c):
        g = jax.grad(lambda z: jnp.sum(
            l2_normalize(z.reshape(B, H * W, 1, C), axis=1)
            .astype(jnp.float32)))(c)
        return c + g.astype(c.dtype) * 1e-6

    add("l2_normalize over L fwd+bwd", l2g)

    # attention-core einsums at model shapes (heads=1, c=16, L=65536)
    from underwater_image_restoration_tpu.ops import (
        channel_attention_core_nhwc,
    )
    temp = jnp.ones((1, 1, 1, 1), jnp.float32)

    def attnf(c):
        q = c.reshape(B, H * W, 1, C)
        out, _ = channel_attention_core_nhwc(q, q, q, temp)
        return out.reshape(c.shape).astype(c.dtype)

    add("attn core fwd", attnf)

    def attng(c):
        def loss(z):
            q = z.reshape(B, H * W, 1, C)
            out, _ = channel_attention_core_nhwc(q, q, q, temp)
            return jnp.sum(out.astype(jnp.float32))

        g = jax.grad(loss)(c)
        return c + g.astype(c.dtype) * 1e-6

    add("attn core fwd+bwd", attng)

    return x, cases


class _Seq84:
    """Helper 'module': C -> 84 (1x1) [-> dw3x3] [-> gelu-gate] -> C."""

    def __init__(self, dt, dwconv: bool, gate: bool):
        import flax.linen as nn
        import jax.numpy as jnp

        from underwater_image_restoration_tpu.ops import Conv2d, gelu

        class M(nn.Module):
            @nn.compact
            def __call__(self, z):
                y = Conv2d(84, 1, use_bias=False, dtype=dt, name="up")(z)
                if dwconv:
                    y = Conv2d(84, 3, padding=1, groups=84, use_bias=False,
                               dtype=dt, name="dw")(y)
                if gate:
                    a, b = jnp.split(y, 2, axis=-1)
                    y = gelu(a) * b
                return Conv2d(C, 1, use_bias=False, dtype=dt, name="down")(y)

        self._m = M()

    def init(self, *a):
        return self._m.init(*a)

    def apply(self, *a):
        return self._m.apply(*a)


def run_case(idx: int) -> None:
    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    x, cases = build_cases()
    name, f = cases[idx]

    def chain(n):
        @jax.jit
        def run(x0):
            y, _ = jax.lax.scan(lambda c, _: (f(c), None), x0, length=n)
            return jnp.sum(y.astype(jnp.float32))

        return run

    times = {}
    for n in (N1, N2):
        run = chain(n)
        float(run(x))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(run(x))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_iter = (times[N2] - times[N1]) / (N2 - N1)
    print(f"{name:28s} {per_iter * 1e3:8.2f} ms/op   "
          f"({per_iter / B * 1e3:6.3f} ms/img)", flush=True)


def main():
    import subprocess

    here = os.path.abspath(__file__)
    _, cases = None, None
    # case count without importing jax backends twice: hardcode via probe
    probe = subprocess.run(
        [sys.executable, here, "--count"], capture_output=True, text=True)
    n_cases = int(probe.stdout.strip() or 0)
    indices = list(range(n_cases))
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        indices = [int(i) for i in sys.argv[2].split(",")]
    for idx in indices:
        for attempt in range(2):
            try:
                res = subprocess.run(
                    [sys.executable, here, "--case", str(idx)],
                    capture_output=True, text=True, timeout=1500)
                rc, out = res.returncode, (res.stdout or "").strip()
                tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            except subprocess.TimeoutExpired:
                rc, out, tail = -9, "", ["subprocess timeout"]
            if rc == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            print(f"# case {idx}: attempt {attempt + 1} rc={rc} "
                  f"{tail[0][:110]}", flush=True)
            time.sleep(30)
        else:
            print(f"case {idx} FAILED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--count":
        # keep in sync with build_cases() (17 cases)
        print(17)
    elif len(sys.argv) > 2 and sys.argv[1] == "--case":
        run_case(int(sys.argv[2]))
    else:
        main()

#!/usr/bin/env python
"""Per-op honest timing of the fused Pallas kernels (scan-chain harness).

Round-4 attribution says the 8 full-res blocks still cost ~24.5 ms/img
with both fused kernels on (baseline 29.9, no-fullres 111.7 img/s) — yet
their minimal HBM traffic prices at ~2 ms/img at the measured ~270 GB/s.
This bench times each fused kernel (and its XLA unfused counterpart) in
isolation at the exact model shapes, fwd and fwd+bwd, via the
op_microbench scan-difference method (N2-N1 cancels the ~27 ms host
value-fetch round-trip).

Usage: python experiments/fused_microbench.py [--only i,j,...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 16, 256, 256
N1, N2 = 4, 12


def build_cases():
    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.ops import fused_attn, fused_block

    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    cases = []

    def add(name, f):
        cases.append((name, f))

    def make_kernel_cases(c, nh, ef):
        hid = int(c * ef)
        k = jax.random.PRNGKey(c)
        ks = jax.random.split(k, 16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        w_in = jax.random.normal(ks[0], (c, 2 * hid), jnp.float32) * 0.1
        w_dw = jax.random.normal(ks[1], (3, 3, 2 * hid), jnp.float32) * 0.1
        w_out = jax.random.normal(ks[2], (hid, c), jnp.float32) * 0.1
        w_qkv = jax.random.normal(ks[3], (c, 3 * c), jnp.float32) * 0.1
        t_qkv = jax.random.normal(ks[4], (3, 3, 3 * c), jnp.float32) * 0.1
        temp = jnp.ones((1, nh, 1, 1), jnp.float32)
        w_po = jax.random.normal(ks[5], (c, c), jnp.float32) * 0.1
        w_kv = jax.random.normal(ks[6], (c, 2 * c), jnp.float32) * 0.1
        t_kv = jax.random.normal(ks[7], (3, 3, 2 * c), jnp.float32) * 0.1
        w_pof = jax.random.normal(ks[8], (c, c), jnp.float32) * 0.1

        def gdfn_f(x):
            return fused_block.fused_ln_gdfn(
                x, sc, bi, w_in, w_dw, w_out).astype(x.dtype)

        def gdfn_g(x):
            g = jax.grad(lambda z: jnp.sum(
                fused_block.fused_ln_gdfn(
                    z, sc, bi, w_in, w_dw, w_out).astype(jnp.float32)))(x)
            return x + g.astype(x.dtype) * 1e-6

        def mdta_f(x):
            return fused_attn.fused_ln_mdta(
                x, sc, bi, w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof,
                num_heads=nh).astype(x.dtype)

        def mdta_g(x):
            g = jax.grad(lambda z: jnp.sum(
                fused_attn.fused_ln_mdta(
                    z, sc, bi, w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof,
                    num_heads=nh).astype(jnp.float32)))(x)
            return x + g.astype(x.dtype) * 1e-6

        return gdfn_f, gdfn_g, mdta_f, mdta_g

    for c, nh, ef in ((16, 1, 2.66), (32, 2, 2.66)):
        gf, gg, mf, mg = make_kernel_cases(c, nh, ef)
        add(f"fused LN+GDFN C={c} fwd", (gf, c))
        add(f"fused LN+GDFN C={c} fwd+bwd", (gg, c))
        add(f"fused LN+MDTA C={c} fwd", (mf, c))
        add(f"fused LN+MDTA C={c} fwd+bwd", (mg, c))

    # banded + composed-matmul GDFN variant (ops/fused_gdfn_banded)
    from underwater_image_restoration_tpu.ops import fused_gdfn_banded

    def make_banded_cases(c, ef):
        hid = int(c * ef)
        k = jax.random.PRNGKey(100 + c)
        ks = jax.random.split(k, 4)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        w_in = jax.random.normal(ks[0], (c, 2 * hid), jnp.float32) * 0.1
        w_dw = jax.random.normal(ks[1], (3, 3, 2 * hid), jnp.float32) * 0.1
        w_out = jax.random.normal(ks[2], (hid, c), jnp.float32) * 0.1

        def bf(x):
            return fused_gdfn_banded.fused_ln_gdfn_banded(
                x, sc, bi, w_in, w_dw, w_out).astype(x.dtype)

        def bg(x):
            g = jax.grad(lambda z: jnp.sum(
                fused_gdfn_banded.fused_ln_gdfn_banded(
                    z, sc, bi, w_in, w_dw, w_out).astype(jnp.float32)))(x)
            return x + g.astype(x.dtype) * 1e-6

        return bf, bg

    for c in (16, 32):
        bf, bg = make_banded_cases(c, 2.66)
        add(f"banded LN+GDFN C={c} fwd", (bf, c))
        add(f"banded LN+GDFN C={c} fwd+bwd", (bg, c))

    # composed / banded MDTA variants
    from underwater_image_restoration_tpu.ops import (
        fused_attn_banded, fused_attn_composed,
    )

    def make_attn_variant_cases(mod, fn_name, c, nh):
        k = jax.random.PRNGKey(200 + c)
        ks = jax.random.split(k, 8)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        w_qkv = jax.random.normal(ks[0], (c, 3 * c), jnp.float32) * 0.1
        t_qkv = jax.random.normal(ks[1], (3, 3, 3 * c), jnp.float32) * 0.1
        temp = jnp.ones((1, nh, 1, 1), jnp.float32)
        w_po = jax.random.normal(ks[2], (c, c), jnp.float32) * 0.1
        w_kv = jax.random.normal(ks[3], (c, 2 * c), jnp.float32) * 0.1
        t_kv = jax.random.normal(ks[4], (3, 3, 2 * c), jnp.float32) * 0.1
        w_pof = jax.random.normal(ks[5], (c, c), jnp.float32) * 0.1
        fn = getattr(mod, fn_name)

        def vf(x):
            return fn(x, sc, bi, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
                      w_pof, num_heads=nh).astype(x.dtype)

        def vg(x):
            g = jax.grad(lambda z: jnp.sum(
                fn(z, sc, bi, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
                   w_pof, num_heads=nh).astype(jnp.float32)))(x)
            return x + g.astype(x.dtype) * 1e-6

        return vf, vg

    for label, mod, fn_name in (
            ("composed", fused_attn_composed, "fused_ln_mdta_composed"),
            ("bandedA", fused_attn_banded, "fused_ln_mdta_banded")):
        for c, nh in ((16, 1), (32, 2)):
            vf, vg = make_attn_variant_cases(mod, fn_name, c, nh)
            add(f"{label} LN+MDTA C={c} fwd", (vf, c))
            add(f"{label} LN+MDTA C={c} fwd+bwd", (vg, c))

    # XLA unfused halves on the chw layout, same shapes, for the A/B
    import flax.linen as nn

    from underwater_image_restoration_tpu.models.spectral_transformer import (
        GDFN, MDTA, LayerNorm,
    )

    def module_case(mod, c, train):
        import jax

        x0 = jax.random.normal(jax.random.PRNGKey(1), (B, c, H, W), dt)
        params = mod.init(jax.random.PRNGKey(2), x0)

        if train:
            def f(z):
                g = jax.grad(lambda q: jnp.sum(
                    mod.apply(params, q).astype(jnp.float32)))(z)
                return z + g.astype(z.dtype) * 1e-6
        else:
            def f(z):
                return (z + mod.apply(params, z)).astype(z.dtype)
        return (f, c)

    class _LNMDTA(nn.Module):
        c: int
        nh: int

        @nn.compact
        def __call__(self, z):
            y = LayerNorm(dtype=dt, axis=1, name="norm1")(z)
            return MDTA(self.c, self.nh, dtype=dt, channels_first=True,
                        name="attn")(y)

    class _LNGDFN(nn.Module):
        c: int

        @nn.compact
        def __call__(self, z):
            y = LayerNorm(dtype=dt, axis=1, name="norm2")(z)
            return GDFN(self.c, 2.66, dtype=dt, channels_first=True,
                        name="ffn")(y)

    for c, nh in ((16, 1), (32, 2)):
        add(f"xla LN+GDFN chw C={c} fwd", module_case(_LNGDFN(c), c, False))
        add(f"xla LN+GDFN chw C={c} fwd+bwd",
            module_case(_LNGDFN(c), c, True))
        add(f"xla LN+MDTA chw C={c} fwd",
            module_case(_LNMDTA(c, nh), c, False))
        add(f"xla LN+MDTA chw C={c} fwd+bwd",
            module_case(_LNMDTA(c, nh), c, True))

    return cases


def run_case(idx: int) -> None:
    os.environ.setdefault("UIRT_FUSED_GDFN", "1")
    os.environ.setdefault("UIRT_FUSED_ATTN", "1")

    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)

    import jax
    import jax.numpy as jnp

    cases = build_cases()
    name, (f, c) = cases[idx]
    x = jax.random.normal(jax.random.PRNGKey(9), (B, c, H, W), jnp.bfloat16)

    def chain(n):
        @jax.jit
        def run(z):
            def body(carry, _):
                return f(carry), None

            out, _ = jax.lax.scan(body, z, None, length=n)
            return out[0, 0, 0, 0].astype(jnp.float32)

        return run

    f1, f2 = chain(N1), chain(N2)
    # warm both compiles + one execution each
    float(np.asarray(f1(x)))
    float(np.asarray(f2(x)))

    def best(fn, windows=3):
        b = 1e30
        for _ in range(windows):
            t0 = time.perf_counter()
            float(np.asarray(fn(x)))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(f1), best(f2)
    per = (t2 - t1) / (N2 - N1) * 1e3
    print(f"{name:34s} {per:8.2f} ms/iter  ({per / B:6.3f} ms/img)",
          flush=True)


def main():
    here = os.path.abspath(__file__)
    import subprocess

    cases = None
    indices = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        indices = [int(x) for x in sys.argv[2].split(",")]
    if indices is None:
        # enumerate without importing jax in the parent
        n = 28
        indices = list(range(n))
    for idx in indices:
        for attempt in range(2):
            try:
                res = subprocess.run(
                    [sys.executable, here, "--case", str(idx)],
                    capture_output=True, text=True, timeout=1500)
            except subprocess.TimeoutExpired:
                print(f"# case {idx}: timeout", flush=True)
                break
            out = (res.stdout or "").strip()
            if res.returncode == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            print(f"# case {idx}: attempt {attempt + 1} rc={res.returncode} "
                  f"{tail[0][:130]}", flush=True)
            time.sleep(30)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--case":
        run_case(int(sys.argv[2]))
    else:
        main()

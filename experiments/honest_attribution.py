#!/usr/bin/env python
"""Honest component attribution for the Spectral@256 train step.

The first honest hardware numbers (round 3: bs16 K=2 shift 11.8 img/s,
hybrid 18.5) sit at ~1% of the 1,880 img/s MXU roofline bound — the step is
NOT matmul-bound, and the enqueue-rate-era ablation tables (PERF_NOTES.md
round 1-2) cannot say what it IS bound by.  jax.profiler is unusable
through the tunnel (op-by-op replay), so this script attributes cost by
component ablation with the honest value-fetch harness: each cell
monkeypatches ONE component to a shape-preserving stub, re-times the whole
step, and the delta prices that component.

Deltas are lower bounds per component (removing one component can shift
fusion around another), but they rank the bottlenecks — which is what
optimization needs.

Usage: python experiments/honest_attribution.py [--only i,j,...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# UIRT_ATTR_{BATCH,SIZE,K} parameterize the workload: the 256² shares do
# not transfer to the 1024² reference train res (level mix differs, UpS
# FFTs grow as H²logH — VERDICT r4 weak #3), so the same cells run there
# via UIRT_ATTR_SIZE=1024 UIRT_ATTR_BATCH=1.
BATCH = int(os.environ.get("UIRT_ATTR_BATCH", "16"))
SIZE = int(os.environ.get("UIRT_ATTR_SIZE", "256"))
K = int(os.environ.get("UIRT_ATTR_K", "2"))
# Round-3 tables were taken with {"UIRT_DWCONV": "hybrid"}; round 4 runs
# the shipping defaults (lax dwconv + chw layout + fused LN+MDTA and
# LN+GDFN Pallas kernels at the qualifying levels).  NOTE: with the fused
# kernels on, the mdta/gdfn/layernorm/l2norm/attn_core patches only reach
# the UNFUSED instances (128²/64²/32² levels) — the full-res blocks route
# around the patched modules, which is exactly what round 4 needs priced.
BASE_ENV: dict = {}

# label -> (patch names, extra env, model_kw)
CELLS = [
    ("baseline", [], {}, {}),
    # MDTA frequency branch: one fftn + one ifftn (c64, full res) per block
    ("no-mdta-fft", ["mdta_fft"], {}, {}),
    # UpS spectral path: fft2 + polar recombine + ifft per upsample
    ("no-ups-fft", ["ups_fft"], {}, {}),
    ("no-all-fft", ["mdta_fft", "ups_fft"], {}, {}),
    # all depthwise 3x3s -> center-tap elementwise multiply (prices the
    # dwconv chain wholesale, fwd+bwd)
    ("no-dwconv", ["dwconv"], {}, {}),
    # LayerNorm -> identity (prices LN's reductions + HBM traffic at the
    # lane-padded full-res levels)
    ("no-layernorm", ["layernorm"], {}, {}),
    # exact-erf gelu -> tanh approx (NOT parity safe; pricing only)
    ("fastgelu", [], {"UIRT_FAST_GELU": "1"}, {}),
    # l2_normalize on q/k -> identity (prices the norm reductions)
    ("no-l2norm", ["l2norm"], {}, {}),
    # per-level honest re-run (the round-2 12.5% "negative result" on the
    # lane-padded full-res levels came from the broken enqueue-rate harness)
    ("no-fullres-blocks", [], {},
     dict(num_blocks=(0, 3, 3, 4), num_refinement=0)),
    ("no-128-blocks", [], {}, dict(num_blocks=(2, 0, 3, 4))),
    ("no-64-blocks", [], {}, dict(num_blocks=(2, 3, 0, 4))),
    ("no-32-blocks", [], {}, dict(num_blocks=(2, 3, 3, 0))),
    # -- round-3b: sub-block attribution (which HALF of the block binds) --
    ("no-mdta", ["mdta"], {}, {}),
    ("no-gdfn", ["gdfn"], {}, {}),
    # attention core -> v passthrough: prices the gram/softmax/apply
    # einsums while keeping qkv/kv convs, norms, and rearranges
    ("no-attn-core", ["attn_core"], {}, {}),
    # f32->bf16 LayerNorm statistics (prices the f32 round-trips; NOT
    # parity-safe, pricing only)
    ("ln-bf16", [], {"UIRT_LN_BF16": "1"}, {}),
    # -- round-4b: pricing the residual ~24% (non-block components) --
    # stem + output 3x3 convs at full res -> channel-mean broadcast
    ("no-stem-io", ["stem_io"], {}, {}),
    # DownSample conv3x3 -> channel slice (keeps pixel_unshuffle)
    ("no-downsample", ["downsample"], {}, {}),
    # whole UpS module (FFT path + shuffle path + reduce) -> NN-upsample
    ("no-ups-full", ["ups_full"], {}, {}),
    # loss -> mean(pred - truth) (prices L1withColor's angle/acos path)
    ("triv-loss", ["loss"], {}, {}),
    # adam -> plain sgd (prices the m/v moment streams over all params)
    ("sgd-opt", ["sgd"], {}, {}),
]


def apply_patches(names):
    import flax.linen as nn
    import jax.numpy as jnp

    from underwater_image_restoration_tpu import ops
    from underwater_image_restoration_tpu.models import spectral_transformer as st
    from underwater_image_restoration_tpu.ops import layers as L
    from underwater_image_restoration_tpu.parallel import cp_ops

    if "mdta_fft" in names:
        cp_ops.fftn_real_spatial = lambda x, mesh=None: x
        cp_ops.ifftn_real_spatial = lambda x, mesh=None: x
    if "ups_fft" in names:
        cp_ops.fft2 = lambda x, mesh=None: x.astype(jnp.complex64)
        cp_ops.spectral_tile_upsample = (
            lambda mag, pha, mesh=None: jnp.repeat(
                jnp.repeat(mag + pha, 2, axis=1), 2, axis=2))
    if "dwconv" in names:
        L._depthwise_conv_hybrid = (
            lambda x, k, meta: x * k[k.shape[0] // 2, k.shape[1] // 2, 0])
    if "layernorm" in names:
        class _IdLN(nn.Module):
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x):
                return x

        st.LayerNorm = _IdLN
    if "l2norm" in names:
        st.l2_normalize = lambda x, axis=-1, eps=1e-12: x
    if "mdta" in names:
        class _IdMDTA(nn.Module):
            channels: int
            num_heads: int
            dtype: object = jnp.float32
            mesh: object = None

            @nn.compact
            def __call__(self, x):
                return x

        st.MDTA = _IdMDTA
    if "gdfn" in names:
        class _IdGDFN(nn.Module):
            channels: int
            expansion_factor: float
            dtype: object = jnp.float32

            @nn.compact
            def __call__(self, x):
                return x

        st.GDFN = _IdGDFN
    if "stem_io" in names:
        from underwater_image_restoration_tpu.ops.layers import Conv2d

        _orig_conv = Conv2d.__call__

        def _conv_patched(self, x):
            if self.name in ("embed_conv_rgb", "outputl", "output"):
                m = jnp.mean(x, axis=-1, keepdims=True)
                return jnp.broadcast_to(
                    m, x.shape[:-1] + (self.features,)).astype(x.dtype)
            return _orig_conv(self, x)

        Conv2d.__call__ = _conv_patched
    if "downsample" in names:
        def _down_patched(self, x):
            return st.pixel_unshuffle(x[..., : x.shape[-1] // 2], 2)

        st.DownSample.__call__ = _down_patched
    if "ups_full" in names:
        def _ups_patched(self, x):
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return y[..., : self.channels // 2]

        st.UpS.__call__ = _ups_patched
    if "loss" in names:
        import underwater_image_restoration_tpu.losses as _losses

        _losses.LossFunction.__call__ = (
            lambda self, pred, truth: jnp.mean(
                pred.astype(jnp.float32) - truth.astype(jnp.float32)))
    if "sgd" in names:
        from underwater_image_restoration_tpu.train import optim as _optim
        from underwater_image_restoration_tpu.train import trainer as _trainer

        _orig_get = _optim.get_optimizer

        def _sgd_get(name, lr, **kw):
            kw.pop("momentum", None)
            return _orig_get("sgd", lr, momentum=0.0, **kw)

        # benchlib re-imports the name through the trainer module, so patch
        # every live binding
        _optim.get_optimizer = _sgd_get
        _trainer.get_optimizer = _sgd_get
    if "attn_core" in names:
        import underwater_image_restoration_tpu.models.spectral_transformer as _st

        def _id_core(q, k, v, temperature):
            # blhc layout only: out=v, attn=zeros of the gram shape
            c = v.shape[-1]
            attn = jnp.zeros(
                (q.shape[0], temperature.shape[1], c, c), jnp.float32)
            return v, attn

        _st.channel_attention_core = _id_core
        _st.channel_attention_core_nhwc = _id_core


def run_cell(idx: int) -> None:
    label, names, env, model_kw = CELLS[idx]
    os.environ.update(BASE_ENV)
    os.environ.update(env)

    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import (
        DEFAULT_COMPILE_CACHE,
    )

    enable_compile_cache(DEFAULT_COMPILE_CACHE)
    apply_patches(names)
    from underwater_image_restoration_tpu.train.benchlib import (
        time_train_step,
    )

    r = time_train_step("SpectralTransformer", SIZE, BATCH, steps=8,
                        windows=2, n_batches=1, k_steps=K, **model_kw)
    print(f"{label:16s} {r:9.1f} img/s", flush=True)


def main():
    here = os.path.abspath(__file__)
    indices = list(range(len(CELLS)))
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        indices = [int(x) for x in sys.argv[2].split(",")]
    for idx in indices:
        label = CELLS[idx][0]
        for attempt in range(3):
            try:
                res = subprocess.run(
                    [sys.executable, here, "--cell", str(idx)],
                    capture_output=True, text=True, timeout=1500)
                rc, out = res.returncode, (res.stdout or "").strip()
                tail = (res.stderr or "").strip().splitlines()[-1:] or ["?"]
            except subprocess.TimeoutExpired:
                rc, out, tail = -9, "", ["subprocess timeout"]
            if rc == 0 and out:
                print(out.splitlines()[-1], flush=True)
                break
            print(f"# {label}: attempt {attempt + 1} rc={rc} "
                  f"{tail[0][:110]}", flush=True)
            if "PrescreenOOM" in tail[0]:
                break
            time.sleep(45)
        else:
            print(f"{label:16s} FAILED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell(int(sys.argv[2]))
    else:
        main()

#!/usr/bin/env python
"""Honest component attribution for the AST@256 train step.

VERDICT r4 weak #4: AST got no perf lever in round 4 and no attribution
table exists — the fused-LeFF negative (27.0 vs 29.2 img/s) was diagnosed
as the per-block tokens->NCHW transpose pair, but neither the LeFF share
nor the transpose cost was ever measured in isolation.  Same method as
honest_attribution.py: each cell monkeypatches ONE component to a
shape-preserving stub, re-times the whole step with the value-fetch
harness, and the delta prices the component.  Deltas are lower bounds
(fusion shifts around stubs) but rank the bottlenecks.

Reference workload: AST.py:680-921, depths (2,)*9, embed 32, win 8.

Usage: python experiments/ast_attribution.py [--only i,j,...]
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, SIZE, K = 16, 256, 2

# label -> (patch names, extra env, model_kw)
CELLS = [
    ("baseline", [], {}, {}),
    # token MLP (LeFF) -> identity everywhere: prices the FFN half
    # (the roofline says LeFF linears are ~180 of AST's 247 dot GFLOP/img)
    ("no-leff", ["leff"], {}, {}),
    # window attention core -> v passthrough (keeps qkv/proj/partition)
    ("no-attn-core", ["attn_core"], {}, {}),
    # whole WindowAttentionSparse -> identity (also kills qkv/proj)
    ("no-attn", ["attn"], {}, {}),
    # per-stage: full-res pair (encoderlayer_0 + decoderlayer_3)
    ("no-fullres-stages", [], {},
     dict(depths=(0, 2, 2, 2, 2, 2, 2, 2, 0))),
    # 128^2 pair
    ("no-128-stages", [], {}, dict(depths=(2, 0, 2, 2, 2, 2, 2, 0, 2))),
    # bottleneck + 16^2/32^2 levels
    ("no-deep-stages", [], {}, dict(depths=(2, 2, 0, 0, 0, 0, 0, 2, 2))),
    # price a gratuitous NHWC<->NCHW transpose pair around every token MLP
    # (what the fused LeFF path pays per block): baseline + pairs = the
    # transpose tax the stage-hoisting fix would delete
    ("add-transpose-pair", ["transpose_pair"], {}, {}),
    # stem/output projections -> channel-mean broadcast
    ("no-io-proj", ["io_proj"], {}, {}),
    # up/down resamplers -> shuffle-based stand-ins (prices their convs)
    ("no-resample-convs", ["resample"], {}, {}),
]


def apply_patches(names):
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.models import ast as A
    from underwater_image_restoration_tpu.models import blocks as BL

    if "leff" in names:
        def _id_mlp(kind, dim, hid, dtype, name):
            return lambda y: y

        A.make_token_mlp = _id_mlp
        BL.make_token_mlp = _id_mlp
    if "transpose_pair" in names:
        _orig_make = BL.make_token_mlp

        def _tp_mlp(kind, dim, hid, dtype, name):
            inner = _orig_make(kind, dim, hid, dtype, name)

            def f(y):
                import math

                b, l, c = y.shape
                h = w = int(math.sqrt(l))
                img = y.reshape(b, h, w, c)
                xc = jnp.transpose(img, (0, 3, 1, 2))
                xc = xc + 0.0  # materialize the NCHW layout
                img = jnp.transpose(xc, (0, 2, 3, 1))
                return inner(img.reshape(b, l, c))

            return f

        A.make_token_mlp = _tp_mlp
        BL.make_token_mlp = _tp_mlp
    if "attn_core" in names:
        from underwater_image_restoration_tpu.ops import attention as AT

        def _id_core(q, k, v, bias, scale=1.0, mask=None, sparse=None,
                     sparse_w=None, **kw):
            return v

        AT.window_attention_core = _id_core
        BL.window_attention_core = _id_core
    if "attn" in names:
        def _id_attn_call(self, x, mask=None, batch=None, n_win_h=None):
            return x

        BL.WindowAttentionSparse.__call__ = _id_attn_call
    if "io_proj" in names:
        def _in_patched(self, x):
            m = jnp.mean(x, axis=-1, keepdims=True)
            y = jnp.broadcast_to(
                m, x.shape[:-1] + (self.out_channels,)).astype(self.dtype)
            b, h, w, c = y.shape
            return y.reshape(b, h * w, c)

        def _out_patched(self, x):
            import math

            b, l, c = x.shape
            h = w = int(math.sqrt(l))
            m = jnp.mean(x, axis=-1, keepdims=True)
            y = jnp.broadcast_to(m, (b, l, self.out_channels))
            return y.reshape(b, h, w, self.out_channels)

        A.ASTInputProj.__call__ = _in_patched
        A.ASTOutputProj.__call__ = _out_patched
    if "resample" in names:
        from underwater_image_restoration_tpu.ops.resample import (
            image_to_tokens, tokens_to_image,
        )

        def _down_patched(self, x):
            img = tokens_to_image(x)
            b, h, w, c = img.shape
            y = img.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
            y = jnp.concatenate(
                [y] * (self.out_channels // c) if self.out_channels >= c
                else [y[..., : self.out_channels]], -1)
            return image_to_tokens(y.astype(self.dtype))

        def _up_patched(self, x):
            img = tokens_to_image(x)
            y = jnp.repeat(jnp.repeat(img, 2, axis=1), 2, axis=2)
            return image_to_tokens(
                y[..., : self.out_channels].astype(self.dtype))

        A.ASTDownsample.__call__ = _down_patched
        A.ASTUpsample.__call__ = _up_patched


def run_cell(idx: int) -> None:
    label, names, env, model_kw = CELLS[idx]
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

    r = time_train_step("AST", SIZE, BATCH, steps=8, windows=2,
                        n_batches=1, k_steps=K, **model_kw)
    print(f"{label:20s} {r:9.1f} img/s", flush=True)


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
            print(f"{label:20s} FAILED", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        run_cell(int(sys.argv[2]))
    else:
        main()

"""Pallas TPU kernels for the hot attention path.

``window_attention`` fuses the whole windowed-attention core — q·kᵀ,
relative-position bias, shift mask, the sparse relu²/softmax mix
(reference AST.py:144-222, block.py:284-370) and attn·v — into one kernel:

- the (H, N, N) attention matrices never touch HBM (the XLA path
  materializes BOTH softmax(attn) and relu(attn)² per window in f32);
- f32 accumulation on the MXU regardless of input dtype;
- G windows are blocked per grid program (folded with heads into Mosaic's
  single supported batch dim) so each program feeds the MXU G·H batched
  64×d matmuls — measured ~2.3x over the XLA fusion at AST shapes
  (bq=4096, h=2, n=64, d=32: 2.8ms vs 6.5ms fwd on one chip);
- backward recomputes attention from (q, k, v, bias) — FlashAttention-style
  residual policy — so training does not store the O(B·nW·H·N²) attention
  activations.

Dispatch: ``ops.attention.window_attention`` routes here on TPU backends
when UIRT_PALLAS=1 (opt-in).  Measured on one v5e: the isolated op is
1.6-2.3x faster than XLA's fusion, but inside full models XLA fuses
attention with its surrounding ops and matches or beats the kernel end to
end at training batch sizes — so the default stays XLA; opt in when
HBM-bound (this kernel's recompute backward skips storing the O(nW*N^2)
attention activations).  Numerics match the core to f32 rounding.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_G = 32  # windows per grid program, before the VMEM budget cap
_VMEM_BUDGET = 14 * 1024 * 1024  # inside the 16MB scoped-vmem limit
# (the padding-aware estimate below overshoots real usage ~1.5x, so this
# lands G comfortably under the hardware cap in practice)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _pick_g(n_items: int, h: int, n: int, m: int, d: int) -> int:
    """Largest divisor of n_items (<= 32) whose per-program VMEM footprint
    fits the budget.  Accounts for TPU tile padding: the LANE (last) dim of
    every buffer pads to 128, the sublane dim to 8 — small head dims (d=8)
    inflate 16x, which is what actually bounds G."""
    d_eff = _round_up(d, 128)
    m_eff = _round_up(m, 128)
    n_sub = _round_up(n, 8)
    # q/k/v in + f32 staging copies (~6 B/elem), two f32 attn matrices +
    # softmax temp (~12 B/elem), out + staging (~6 B/elem)
    per_g = h * (3 * n_sub * d_eff * 6 + n_sub * m_eff * 12
                 + n_sub * d_eff * 6)
    g_cap = max(1, min(_MAX_G, _VMEM_BUDGET // max(1, per_g)))
    for g in range(min(g_cap, n_items), 0, -1):
        if n_items % g == 0:
            return g
    return 1


def _mix(attn, sm, w_ref, sparse: bool):
    if not sparse:
        return sm
    # SMEM loads are scalar-at-a-time
    e0 = jnp.exp(w_ref[0, 0].astype(jnp.float32))
    e1 = jnp.exp(w_ref[0, 1].astype(jnp.float32))
    s = e0 + e1
    return sm * (e0 / s) + jnp.square(jnp.maximum(attn, 0.0)) * (e1 / s)


def _kernel_nomask(q_ref, k_ref, v_ref, bias_ref, w_ref, out_ref, *,
                   scale: float, sparse: bool):
    g, h, n, d = q_ref.shape
    m = k_ref.shape[2]
    q = q_ref[:].astype(jnp.float32).reshape(g * h, n, d) * scale
    k = k_ref[:].astype(jnp.float32).reshape(g * h, m, d)
    v = v_ref[:].astype(jnp.float32).reshape(g * h, m, d)
    attn = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    attn = (attn.reshape(g, h, n, m)
            + bias_ref[:].astype(jnp.float32)[None]).reshape(g * h, n, m)
    attn = _mix(attn, jax.nn.softmax(attn, axis=-1), w_ref, sparse)
    out = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(g, h, n, d).astype(out_ref.dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, w_ref, mask_ref, out_ref,
                   *, scale: float, sparse: bool):
    g, _one, h, n, d = q_ref.shape
    m = k_ref.shape[3]
    q = q_ref[:].astype(jnp.float32).reshape(g * h, n, d) * scale
    k = k_ref[:].astype(jnp.float32).reshape(g * h, m, d)
    v = v_ref[:].astype(jnp.float32).reshape(g * h, m, d)
    attn = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
    add = (bias_ref[:].astype(jnp.float32)[None]
           + mask_ref[0].astype(jnp.float32)[None, None])
    attn = (attn.reshape(g, h, n, m) + add).reshape(g * h, n, m)
    attn = _mix(attn, jax.nn.softmax(attn, axis=-1), w_ref, sparse)
    out = jax.lax.dot_general(attn, v, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(g, 1, h, n, d).astype(out_ref.dtype)


def _fwd_pallas(q, k, v, bias, sparse_w, mask, *, scale: float,
                interpret: bool = False):
    bq, h, n, d = q.shape
    m = k.shape[2]
    sparse = sparse_w is not None
    w_in = (sparse_w if sparse else jnp.zeros((2,), jnp.float32))
    w_in = w_in.reshape(1, 2).astype(jnp.float32)
    bias_spec_nomask = pl.BlockSpec((h, n, m), lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
    w_spec_nomask = pl.BlockSpec((1, 2), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)

    if mask is None:
        g = _pick_g(bq, h, n, m, d)
        blk = lambda: pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
        blk_kv = lambda: pl.BlockSpec((g, h, m, d), lambda i: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM)
        kernel = functools.partial(_kernel_nomask, scale=scale, sparse=sparse)
        return pl.pallas_call(
            kernel,
            grid=(bq // g,),
            in_specs=[blk(), blk_kv(), blk_kv(), bias_spec_nomask,
                      w_spec_nomask],
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            interpret=interpret,
        )(q, k, v, bias, w_in)

    # masked path: one mask per window index — expose (B, nW) structure so a
    # program can block G batch rows of the SAME window
    nw = mask.shape[0]
    b = bq // nw
    g = _pick_g(b, h, n, m, d)
    q5 = q.reshape(b, nw, h, n, d)
    k5 = k.reshape(b, nw, h, m, d)
    v5 = v.reshape(b, nw, h, m, d)
    blk = lambda last: pl.BlockSpec((g, 1, h, last, d),
                                    lambda i, j: (i, j, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel_masked, scale=scale, sparse=sparse)
    out = pl.pallas_call(
        kernel,
        grid=(b // g, nw),
        in_specs=[
            blk(n), blk(m), blk(m),
            pl.BlockSpec((h, n, m), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=blk(n),
        out_shape=jax.ShapeDtypeStruct(q5.shape, q.dtype),
        interpret=interpret,
    )(q5, k5, v5, bias, w_in, mask)
    return out.reshape(bq, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _window_attention(q, k, v, bias, sparse_w, mask, scale, interpret):
    return _fwd_pallas(q, k, v, bias, sparse_w, mask, scale=scale,
                       interpret=interpret)


def _ref_core(q, k, v, bias, sparse_w, mask, scale):
    # identical math to attention.window_attention_core (local import avoids
    # a cycle); used only to derive the backward pass
    from .attention import window_attention_core

    return window_attention_core(q, k, v, bias, scale=scale,
                                 sparse_w=sparse_w, mask=mask)


def _wa_fwd(q, k, v, bias, sparse_w, mask, scale, interpret):
    out = _fwd_pallas(q, k, v, bias, sparse_w, mask, scale=scale,
                      interpret=interpret)
    return out, (q, k, v, bias, sparse_w, mask)


def _wa_bwd(scale, interpret, res, g):
    q, k, v, bias, sparse_w, mask = res
    # recompute-from-inputs backward: attention is re-derived (cheap, N=64)
    # instead of having been stored by the forward
    diff_args = (q, k, v, bias) if sparse_w is None else (q, k, v, bias,
                                                          sparse_w)

    def f(*args):
        if sparse_w is None:
            qq, kk, vv, bb = args
            return _ref_core(qq, kk, vv, bb, None, mask, scale)
        qq, kk, vv, bb, ww = args
        return _ref_core(qq, kk, vv, bb, ww, mask, scale)

    grads = jax.vjp(f, *diff_args)[1](g)
    if sparse_w is None:
        dq, dk, dv, dbias = grads
        dw = None
    else:
        dq, dk, dv, dbias, dw = grads
    return dq, dk, dv, dbias, dw, None


_window_attention.defvjp(_wa_fwd, _wa_bwd)


def window_attention(q, k, v, bias, *, scale: float,
                     sparse_w: Optional[jnp.ndarray] = None,
                     mask: Optional[jnp.ndarray] = None,
                     interpret: bool = False):
    """Fused drop-in for ``attention.window_attention_core`` (same args)."""
    return _window_attention(q, k, v, bias, sparse_w, mask, float(scale),
                             interpret)

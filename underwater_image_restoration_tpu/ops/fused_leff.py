"""Fused channels-first LN+LeFF block kernel (Pallas TPU) — fully banded.

Computes ``y = x + s_b * LeFF(LayerNorm_C(x))`` where
``LeFF(z) = fc2(gelu(dwconv3x3(gelu(fc1(z)))))`` — the token-MLP half of an
ASTTransformerBlock (reference ``src/Models/AST.py:560-624`` with
``token_mlp='leff'``, block.py:223-247) and ``s_b`` the per-sample DropPath
scale (0 or 1/keep; 1 in eval) — on the channels-first ``(B, C, H, W)``
layout, sharing the flat-2D layout rules of ``ops.fused_block`` (channels
on sublanes, flattened rows*W on lanes; depthwise 3x3 as 9 shifted
guard-buffer slices).

Unlike ``fused_block``/``fused_attn`` this kernel keeps NO whole-image
VMEM residents: both forward and backward stream x in (hc+2)-row halo
windows via ``_dma_x_window``, and the backward replaces fused_block's
whole-image dLN accumulator with a ROLLING LAG-1 FINALIZATION — chunk i's
dLN contributions touch only rows [i*hc-1, (i+1)*hc], so block i-1's dLN
is final as soon as chunk i lands and its LayerNorm backward + dx DMA-out
happen immediately, carrying only (C, hc*W)-sized state.  That banding is
what lets the kernel serve C=64 at 256^2 (AST's decoderlayer_3, where a
whole-image f32 accumulator would blow the 16 MB VMEM) and 1024^2 inputs.

Numerics match the XLA path's materialization points: LayerNorm stats and
affine in f32; matmuls in the compute dtype with f32 accumulation, cast to
the compute dtype BEFORE the bias add (ops.Dense/Conv2d semantics); gelu
evaluated in f32 with XLA's own erf expansion (``fused_block._erf_f32``);
the DropPath scale applied in f32 then rounded.  Zero padding applies to
the dwconv INPUT gelu(fc1(ln)) exactly as torch Conv2d(padding=1) pads.

The backward (custom VJP) saves only x, the weights, and the (B,) scale —
bias grads accumulate per chunk (chunk n2-frames overlap in halo rows, but
dt1 contributions are partitioned by the SOURCE chunk of dt2, so summing
each frame's full rowsum is exact, same argument as fused_block's dwin).
Reverse-mode only (no jax.jvp), like fused_block.

Dispatch is routed from ``models.ast.ASTTransformerBlock`` (and the New*
encoder MLP branch) when the shape qualifies — see ``_fused_leff_enabled``
there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import (
    _any_spec,
    _col_masks,
    _dma_x_window,
    _dw_shift_acc,
    _dw_shift_transpose,
    _gelu_exact,
    _gelu_grad,
    _ln_flat,
    _row_mask,
    _vmem_full,
    _zero_guards,
    _TAPS,
)


def pick_hc(h: int, w: int, c: int, hid: int) -> int:
    """Largest row-chunk dividing H whose ~4 live f32 (hid, (hc+2)*W)
    chunk intermediates stay within ~5 MB.  Unlike fused_block, chunks
    down to 2 rows are allowed: the banded kernel has no whole-image
    buffers, so narrow chunks are what let hid=256 (AST decoder full-res)
    and W=1024 shapes in."""
    for hc in (64, 32, 16, 8, 4, 2):
        if h % hc:
            continue
        # 4 MB (not 5): hardware measured the backward at C=64/hid=256/
        # 128^2 (AST encoderlayer_1) 572 KB over the 16 MB scoped limit
        # with the hc=8 the 5 MB budget picked
        if hid * (hc + 2) * w * 4 * 4 <= 4 * 1024 * 1024:
            return hc
    return 2


def supports(h: int, w: int, c: int | None = None, hid: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate.  Banded streaming keeps only chunk-sized buffers, so
    there is no whole-image term: the budget is the guard buffers plus the
    live f32 chunk intermediates at the minimum chunk (hc=8)."""
    if w % 128 or h % 8:
        return False
    if c is None or hid is None:
        return True
    if c % 8:
        return False
    hc = pick_hc(h, w, c, hid)
    n2 = (hc + 2) * w
    guards = 3 * hid * (n2 + 2 * (w + 128 + w)) * itemsize
    live = 4 * hid * n2 * 4
    return guards + live <= 12 * 1024 * 1024


def _fwd_kernel(x_hbm, scale_ref, bias_ref, w1_ref, b1_ref, taps_ref,
                bdw_ref, w2_ref, b2_ref, s_ref, out_hbm,
                xw, buf, stage, sem_in, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype,
                residual: bool):
    c = scale_ref.shape[0]
    hid = w1_ref.shape[1]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    _zero_guards(buf, p, n2, dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    w1 = w1_ref[:].astype(dtype)
    w2 = w2_ref[:].astype(dtype)
    b1 = b1_ref[:].astype(dtype)
    bdw = bdw_ref[:].astype(dtype)
    b2 = b2_ref[:].astype(dtype)
    s = s_ref[pl.program_id(0), 0]
    masks = _col_masks(w, n)

    def chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        _dma_x_window(x_hbm, b, xw, sem_in, i, nchunks, hc, h, w, dtype)
        ln, _, _ = _ln_flat(xw[:].astype(f32), scale, bias, eps)
        ln = ln.astype(dtype)
        rmask = _row_mask(r0, hc, h, w, n2)
        y1 = jax.lax.dot_general(w1, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        t1 = y1.astype(dtype) + b1
        g1 = _gelu_exact(t1.astype(f32)).astype(dtype)
        buf[:, pl.ds(p, n2)] = jnp.where(rmask, g1, 0)
        t2 = _dw_shift_acc(buf, taps_ref, masks, p, w, n, dtype)
        t2d = t2.astype(dtype) + bdw
        g2 = _gelu_exact(t2d.astype(f32)).astype(dtype)
        u = jax.lax.dot_general(w2, g2, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        yd = u.astype(dtype) + b2
        scaled = (yd.astype(f32) * s).astype(dtype)
        stage[:] = (xw[:, pl.ds(w, n)] + scaled) if residual else scaled
        cp_out = pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(base, n)], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, w1_ref, b1_ref,
                taps_ref, bdw_ref, w2_ref, b2_ref, s_ref,
                dx_hbm, dscale_ref, dbias_ref, dw1_ref, db1_ref,
                dtaps_ref, dbdw_ref, dw2_ref, db2_ref,
                xw, buf, dtbuf, dpend, dcarry, xprev, dyprev, stage,
                sem_in, sem_dy, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype,
                residual: bool):
    c = scale_ref.shape[0]
    hid = w1_ref.shape[1]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dw1_ref, db1_ref, dtaps_ref,
                    dbdw_ref, dw2_ref, db2_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    _zero_guards(buf, p, n2, dtype)
    _zero_guards(dtbuf, p + w, n, dtype)
    dpend[:] = jnp.zeros(dpend.shape, dpend.dtype)
    dcarry[:] = jnp.zeros(dcarry.shape, dcarry.dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    w1 = w1_ref[:].astype(dtype)
    w2 = w2_ref[:].astype(dtype)
    b1 = b1_ref[:].astype(dtype)
    bdw = bdw_ref[:].astype(dtype)
    s = s_ref[pl.program_id(0), 0]
    masks = _col_masks(w, n)
    tmasks2 = {0: _col_masks(w, n2)[2], 1: None, 2: _col_masks(w, n2)[0]}

    def _ln_bwd_out(xf, dln, dy_res):
        """LayerNorm backward for one finalized block + residual dy; also
        accumulates dscale/dbias.  Returns the dx block (C, n) in dtype."""
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        dscale_ref[:, :] += jnp.sum(dln * xhat, axis=1, keepdims=True)
        dbias_ref[:, :] += jnp.sum(dln, axis=1, keepdims=True)
        ds2 = dln * scale
        dxln = rstd * (ds2 - jnp.mean(ds2, axis=0, keepdims=True)
                       - xhat * jnp.mean(ds2 * xhat, axis=0, keepdims=True))
        if not residual:
            return dxln.astype(dtype)
        return dy_res + dxln.astype(dtype)

    def chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base, n)], stage, sem_dy)
        cp_dy.start()
        _dma_x_window(x_hbm, b, xw, sem_in, i, nchunks, hc, h, w, dtype)
        ln, _, _ = _ln_flat(xw[:].astype(f32), scale, bias, eps)
        ln = ln.astype(dtype)
        rmask = _row_mask(r0, hc, h, w, n2)
        y1 = jax.lax.dot_general(w1, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        t1 = y1.astype(dtype) + b1
        t1f = t1.astype(f32)
        g1 = _gelu_exact(t1f).astype(dtype)
        buf[:, pl.ds(p, n2)] = jnp.where(rmask, g1, 0)
        t2 = _dw_shift_acc(buf, taps_ref, masks, p, w, n, dtype)
        t2d = t2.astype(dtype) + bdw
        t2f = t2d.astype(f32)
        g2 = _gelu_exact(t2f).astype(dtype)
        cp_dy.wait()
        dyd = stage[:]
        dyk = (dyd.astype(f32) * s).astype(dtype)
        db2_ref[:, :] += jnp.sum(dyk.astype(f32), axis=1, keepdims=True)
        dw2_ref[:, :] += jax.lax.dot_general(
            g2, dyk, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dg2 = jax.lax.dot_general(w2, dyk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        dt2 = dg2 * _gelu_grad(t2f)
        dbdw_ref[:, :] += jnp.sum(dt2, axis=1, keepdims=True)
        dt2d = dt2.astype(dtype)
        dtbuf[:, pl.ds(p + w, n)] = dt2d
        for k_, (dh, dw) in enumerate(_TAPS):
            off = p + dh * w + dw - 1
            term = buf[:, pl.ds(off, n)].astype(f32) * dt2
            if masks[dw] is not None:
                term = term * masks[dw]
            dtaps_ref[:, k_:k_ + 1] += jnp.sum(term, axis=1, keepdims=True)
        dg1 = _dw_shift_transpose(dtbuf, taps_ref, tmasks2, p, w, n2)
        dt1 = jnp.where(rmask, dg1 * _gelu_grad(t1f), 0.0)
        db1_ref[:, :] += jnp.sum(dt1, axis=1, keepdims=True)
        dt1d = dt1.astype(dtype)
        dw1_ref[:, :] += jax.lax.dot_general(
            ln, dt1d, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dlnc = jax.lax.dot_general(w1, dt1d, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)  # (c, n2)

        # rolling lag-1 finalization: frame i's top-halo row (i*hc - 1) is
        # block i-1's last row — block i-1's dLN is now complete
        @pl.when(i > 0)
        def _finalize_prev():
            dpend[:, pl.ds(n - w, w)] += dlnc[:, 0:w]
            dxb = _ln_bwd_out(xprev[:].astype(f32), dpend[:], dyprev[:])
            stage[:] = dxb
            cp_out = pltpu.make_async_copy(
                stage,
                dx_hbm.at[b, :, pl.ds(pl.multiple_of((r0 - hc) * w, 128),
                                      n)],
                sem_out)
            cp_out.start()
            cp_out.wait()

        # stage the current block's state for the next iteration
        dpend[:] = dlnc[:, w:w + n] + dcarry[:]
        dcarry[:] = jnp.zeros((c, n), f32)
        dcarry[:, pl.ds(0, w)] = dlnc[:, w + n:w + n + w]
        xprev[:] = xw[:, pl.ds(w, n)]
        dyprev[:] = dyd
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)

    # last block: no further halo contributions
    dxb = _ln_bwd_out(xprev[:].astype(f32), dpend[:], dyprev[:])
    stage[:] = dxb
    cp_out = pltpu.make_async_copy(
        stage, dx_hbm.at[b, :, pl.ds((h - hc) * w, n)], sem_out)
    cp_out.start()
    cp_out.wait()


def _split_weights(scale, bias, w1, b1, w_dw, b_dw, w2, b2):
    c, hid = w1.shape
    taps = w_dw.reshape(9, hid).T  # (hid, 9), k = dh*3+dw
    return (scale.reshape(c, 1), bias.reshape(c, 1),
            w1, b1.reshape(hid, 1), taps, b_dw.reshape(hid, 1),
            w2, b2.reshape(c, 1))


def _smem_scalar_spec():
    """Whole-array SMEM spec for the per-sample DropPath scales: Mosaic
    requires block shapes either (8,128)-aligned or equal to the array
    dims, so pass all (bsz, 1) scalars to every program and index by
    program_id in-kernel (dynamic SMEM scalar loads are supported)."""
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_call(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps,
              interpret, residual=True):
    bsz, c, h, w = x.shape
    hid = w1.shape[1]
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    kern = functools.partial(_fwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype, residual=residual)
    out = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((c, hid)), _vmem_full((hid, 1)),
            _vmem_full((hid, 9)), _vmem_full((hid, 1)),
            _vmem_full((hid, c)), _vmem_full((c, 1)),
            _smem_scalar_spec(),
        ],
        out_specs=_any_spec(),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, n2), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w),
      *_split_weights(scale, bias, w1, b1, w_dw, b_dw, w2, b2),
      s.reshape(bsz, 1).astype(jnp.float32))
    return out.reshape(bsz, c, h, w)


def _bwd_call(x, dy, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps,
              interpret, residual=True):
    bsz, c, h, w = x.shape
    hid = w1.shape[1]
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype, residual=residual)
    outs = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(), _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((c, hid)), _vmem_full((hid, 1)),
            _vmem_full((hid, 9)), _vmem_full((hid, 1)),
            _vmem_full((hid, c)), _vmem_full((c, 1)),
            _smem_scalar_spec(),
        ],
        out_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((c, hid)), _vmem_full((hid, 1)),
            _vmem_full((hid, 9)), _vmem_full((hid, 1)),
            _vmem_full((hid, c)), _vmem_full((c, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, hid), f32),
            jax.ShapeDtypeStruct((hid, 1), f32),
            jax.ShapeDtypeStruct((hid, 9), f32),
            jax.ShapeDtypeStruct((hid, 1), f32),
            jax.ShapeDtypeStruct((hid, c), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, n2), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((hid, n + 2 * (p + w)), x.dtype),
            pltpu.VMEM((c, n), f32),
            pltpu.VMEM((c, n), f32),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), dy.reshape(bsz, c, h * w),
      *_split_weights(scale, bias, w1, b1, w_dw, b_dw, w2, b2),
      s.reshape(bsz, 1).astype(jnp.float32))
    dx, dsc, dbi, dw1_, db1_, dtaps, dbdw, dw2_, db2_ = outs
    dwdw = dtaps.T.reshape(3, 3, hid)
    return (dx.reshape(x.shape), dsc.reshape(c), dbi.reshape(c),
            dw1_, db1_.reshape(hid), dwdw, dbdw.reshape(hid),
            dw2_, db2_.reshape(c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _fused_ln_leff(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps,
                   interpret, residual):
    return _fwd_call(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps,
                     interpret, residual)


def _vjp_fwd(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps, interpret,
             residual):
    out = _fwd_call(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps,
                    interpret, residual)
    return out, (x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s)


def _vjp_bwd(eps, interpret, residual, res, dy):
    x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s = res
    dx, dsc, dbi, dw1_, db1_, dwd, dbdw, dw2_, db2_ = _bwd_call(
        x, dy, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s, eps, interpret,
        residual)
    return (dx, dsc.astype(scale.dtype), dbi.astype(bias.dtype),
            dw1_.astype(w1.dtype), db1_.astype(b1.dtype),
            dwd.astype(w_dw.dtype), dbdw.astype(b_dw.dtype),
            dw2_.astype(w2.dtype), db2_.astype(b2.dtype),
            jnp.zeros_like(s))


_fused_ln_leff.defvjp(_vjp_fwd, _vjp_bwd)


def fused_ln_leff(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s=None, *,
                  eps: float = 1e-5, interpret: bool | None = None,
                  residual: bool = True):
    """``x + s_b * LeFF(LayerNorm(x))`` on channels-first ``(B, C, H, W)``
    (``residual=False`` returns just ``s_b * LeFF(LayerNorm(x))`` — the
    New* EncoderBlock consumes the branch output separately).

    scale/bias: LN affine ``(C,)``; w1/b1: fc1 ``(C, hid)``/``(hid,)``;
    w_dw/b_dw: depthwise taps ``(3, 3, hid)``/``(hid,)``; w2/b2: fc2
    ``(hid, C)``/``(C,)``; s: per-sample DropPath scale ``(B,)`` f32
    (``None`` -> ones; 0-or-1/keep in training, so the cotangent of s is
    not needed and is returned as zeros).  Weights may be f32 (cast
    in-kernel).  Reverse-mode AD only."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3], x.shape[1], w1.shape[1]):
        raise ValueError(f"fused_ln_leff: unsupported shape {x.shape}")
    if s is None:
        s = jnp.ones((x.shape[0],), jnp.float32)
    return _fused_ln_leff(x, scale, bias, w1, b1, w_dw, b_dw, w2, b2, s,
                          float(eps), bool(interpret), bool(residual))

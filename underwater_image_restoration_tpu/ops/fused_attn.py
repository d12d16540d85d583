"""Fused channels-first LN+MDTA block kernel (Pallas TPU).

Computes ``y = x + MDTA(LayerNorm_C(x))`` — the first half of a
SpectralBlock (reference ``src/Models/SpectralTransformer.py:76-114,133``)
— in one forward pallas_call per image on the channels-first (B, C, H, W)
layout, sharing the flat-2D layout rules of ``ops.fused_block`` (channels
on sublanes, flattened rows*W on lanes; depthwise 3x3 as 9 shifted
guard-buffer slices).

MDTA's channel attention is linear in pixels but GLOBAL over them: the
(c_h x c_h) per-head attention needs full-image grams of the l2-normalized
q, k.  The kernel exploits that the normalizers are per-CHANNEL scalars:

    Ghat[i,j] = (q_i/|q_i|) . (k_j/|k_j|) = G[i,j] * rq_i * rk_j,

so pass 1 accumulates the raw gram G = q k^T and the row sums-of-squares
Sq, Sk chunk by chunk (tiny (C,C)/(C,1) f32 accumulators in VMEM), an
in-kernel epilogue normalizes, applies the per-head temperature and a
block-masked rowwise softmax (off-head logits -> -1e30) to produce the
block-diagonal dense ``Ablk`` (C,C), and pass 2 streams the image again
computing v -> attn@v -> project_out -> kv -> dwconv -> vf -> attn@vf ->
project_outf -> +x, all chunk-local given Ablk (v/out need halo rows, so
pass 2 works on (hc+4)-row windows).  The reference quirks are preserved:
``attnf`` is dead (never applied — the SPATIAL attn multiplies vf), the
``kf`` half of the kv conv and the whole frequency-q chain are dead code
with zero gradients.

The backward (custom VJP) saves only x, the weights, and the tiny
(G, Sq, Sk) stats.  dA accumulates over two chunk passes (the outf and
out_s uses of attn), an in-kernel epilogue runs the softmax/normalization
backward on the smalls — including l2_normalize's zero-grad-at-zero-row
semantics (the max(S, eps^2) gate) and the temperature gradient via a
head-selector matmul — and two more chunk passes push dq/dk and the
LayerNorm backward out to dx.  Overlapping halo contributions accumulate
in whole-image dLN / d(out) VMEM buffers exactly like fused_block's dlns.

Restriction: reverse-mode only (no jax.jvp), like fused_block.
Dispatch is routed from ``models.spectral_transformer.SpectralBlock`` when
the channels-first layout is active (``_fused_attn_enabled`` there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import (
    _any_spec,
    _col_masks,
    _dma_x_window,
    _dw_shift_acc,
    _dw_shift_transpose,
    _ln_flat,
    _row_mask,
    _vmem_full,
    _zero_guards,
)

_EPS2 = 1e-24  # l2_normalize eps^2 (F.normalize eps=1e-12; ops.l2_normalize)


def pick_hc(h: int, w: int, c: int) -> int:
    """Row chunk: ~6 live f32 (C, (hc+4)*W) chunk tensors within ~5 MB."""
    for hc in (64, 32, 16, 8):
        if h % hc:
            continue
        if 6 * c * (hc + 4) * w * 4 <= 5 * 1024 * 1024:
            return hc
    return 8


def supports(h: int, w: int, c: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate; with c also checks the backward's two whole-image
    accumulators (dLN and d(out)) against the VMEM budget."""
    if w % 128 or h % 8:
        return False
    if c is None:
        return True
    if c % 8:
        return False
    img = c * (h + 2) * w * itemsize
    hc = pick_hc(h, w, c)
    chunk = 8 * c * (hc + 4) * w * 4
    return 2 * img + chunk <= 11 * 1024 * 1024


def _attn_from_stats(g, sq, sk, temp_col, blk, eyec):
    """(Ablk, Ghat, rq, rk_row) from the accumulated stats — all (C,C) /
    (C,1) f32 ops.  Matches l2_normalize (rsqrt of max(S, eps^2)) and
    jax.nn.softmax (max-subtracted, rowwise) over per-head blocks."""
    rq = jax.lax.rsqrt(jnp.maximum(sq, _EPS2))
    rk = jax.lax.rsqrt(jnp.maximum(sk, _EPS2))
    # (C,1) -> (1,C) without a relayout: contract against the identity
    rk_row = jax.lax.dot_general(rk, eyec, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ghat = g * rq * rk_row
    logits = jnp.where(blk > 0, ghat * temp_col, -1e30)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    a = e / jnp.sum(e, axis=1, keepdims=True)
    return jnp.where(blk > 0, a, 0.0), ghat, rq, rk_row


def _fwd_kernel(x_hbm, scale_ref, bias_ref, wq_ref, wk_ref, wv_ref,
                tq_ref, tk_ref, tv_ref, temp_ref, sel_ref, blk_ref,
                wpo_ref, wkvv_ref, tv2_ref,
                wpof_ref, out_hbm, g_ref, sq_ref, sk_ref,
                xp, buf2, buf4, ablk_s, stage, sem_in, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype):
    c = scale_ref.shape[0]
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    cp_in = pltpu.make_async_copy(
        x_hbm.at[b], xp.at[:, pl.ds(2 * w, h * w)], sem_in)
    cp_in.start()
    zrows = jnp.zeros((c, 2 * w), dtype)
    xp[:, 0:2 * w] = zrows
    xp[:, 2 * w + h * w:] = zrows
    _zero_guards(buf2, p, n2, dtype)
    _zero_guards(buf4, p, n4, dtype)
    g_ref[:] = jnp.zeros((c, c), f32)
    sq_ref[:] = jnp.zeros((c, 1), f32)
    sk_ref[:] = jnp.zeros((c, 1), f32)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    wq = wq_ref[:].astype(dtype)
    wk = wk_ref[:].astype(dtype)
    wv = wv_ref[:].astype(dtype)
    wpo = wpo_ref[:].astype(dtype)
    wkvv = wkvv_ref[:].astype(dtype)
    wpof = wpof_ref[:].astype(dtype)
    masks = _col_masks(w, n)
    masks2 = _col_masks(w, n2)
    cp_in.wait()

    def stats_chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base1 = pl.multiple_of((i * hc + 1) * w, 128)
        xh = xp[:, pl.ds(base1, n2)].astype(f32)
        ln, _, _ = _ln_flat(xh, scale, bias, eps)
        ln = ln.astype(dtype)
        rmask = _row_mask(r0, hc, h, w, n2)
        qk = []
        for wgt, taps in ((wq, tq_ref), (wk, tk_ref)):
            y = jax.lax.dot_general(wgt, ln, (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            buf2[:, pl.ds(p, n2)] = jnp.where(rmask, y, 0.0).astype(dtype)
            qk.append(
                _dw_shift_acc(buf2, taps, masks, p, w, n, dtype).astype(
                    dtype))
        q, k = qk
        g_ref[:, :] += jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        qf, kf = q.astype(f32), k.astype(f32)
        sq_ref[:, :] += jnp.sum(qf * qf, axis=1, keepdims=True)
        sk_ref[:, :] += jnp.sum(kf * kf, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, nchunks, stats_chunk, 0)

    eyec = _eye(c)
    temp_col = jax.lax.dot_general(
        sel_ref[:].astype(f32), temp_ref[:].astype(f32),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    ablk, _, _, _ = _attn_from_stats(g_ref[:], sq_ref[:], sk_ref[:],
                                     temp_col, blk_ref[:], eyec)
    ablk_s[:] = ablk

    def out_chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        base2 = pl.multiple_of((i * hc + 2) * w, 128)
        xh = xp[:, pl.ds(base0, n4)].astype(f32)
        ln, _, _ = _ln_flat(xh, scale, bias, eps)
        ln = ln.astype(dtype)
        rmask4 = _row_mask(r0, hc, h, w, n4, halo=2)
        yv = jax.lax.dot_general(wv, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        buf4[:, pl.ds(p, n4)] = jnp.where(rmask4, yv, 0.0).astype(dtype)
        v = _dw_shift_acc(buf4, tv_ref, masks2, p, w, n2, dtype)  # f32
        outs = jax.lax.dot_general(ablk_s[:], v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        out = jax.lax.dot_general(wpo, outs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32).astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        yv2 = jax.lax.dot_general(wkvv, out, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        buf2[:, pl.ds(p, n2)] = jnp.where(rmask2, yv2, 0.0).astype(dtype)
        vf = _dw_shift_acc(buf2, tv2_ref, masks, p, w, n, dtype)  # f32
        outf = jax.lax.dot_general(ablk_s[:], vf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        yout = jax.lax.dot_general(wpof, outf, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        stage[:] = xp[:, pl.ds(base2, n)] + yout.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(base0, n)], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, nchunks, out_chunk, 0)


def _eye(c: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (r == j).astype(jnp.float32)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, wq_ref, wk_ref, wv_ref,
                tq_ref, tk_ref, tv_ref, temp_ref, sel_ref, blk_ref,
                wpo_ref, wkvv_ref, tv2_ref, wpof_ref,
                g_ref, sq_ref, sk_ref,
                dx_hbm, dscale_ref, dbias_ref, dwq_ref, dwk_ref, dwv_ref,
                dtq_ref, dtk_ref, dtv_ref, dtemp_ref, dwpo_ref, dwkvv_ref,
                dtv2_ref, dwpof_ref,
                xw, xw2, douts, dxl, buf2, buf4, dtg, da_s, ablk_s,
                m_s, dsq_s, dsk_s, dych, stage, sem_in, sem_dy, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype):
    c = scale_ref.shape[0]
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dwq_ref, dwk_ref, dwv_ref,
                    dtq_ref, dtk_ref, dtv_ref, dtemp_ref, dwpo_ref,
                    dwkvv_ref, dtv2_ref, dwpof_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    douts[:] = jnp.zeros(douts.shape, douts.dtype)
    dxl[:] = jnp.zeros(dxl.shape, dxl.dtype)
    da_s[:] = jnp.zeros((c, c), f32)
    _zero_guards(buf2, p, n2, dtype)
    _zero_guards(buf4, p, n4, dtype)
    _zero_guards(dtg, p + w, n, dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    wq = wq_ref[:].astype(dtype)
    wk = wk_ref[:].astype(dtype)
    wv = wv_ref[:].astype(dtype)
    wpo = wpo_ref[:].astype(dtype)
    wkvv = wkvv_ref[:].astype(dtype)
    wpof = wpof_ref[:].astype(dtype)
    masks = _col_masks(w, n)
    masks2 = _col_masks(w, n2)
    tmasks2 = {0: _col_masks(w, n2)[2], 1: None, 2: _col_masks(w, n2)[0]}
    eyec = _eye(c)
    sel = sel_ref[:].astype(f32)
    temp_col = jax.lax.dot_general(sel, temp_ref[:].astype(f32),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
    blk = blk_ref[:]
    g = g_ref[:]
    ablk, ghat, rq, rk_row = _attn_from_stats(g, sq_ref[:], sk_ref[:],
                                              temp_col, blk, eyec)
    ablk_s[:] = ablk

    # ---- pass 1: outf-branch backward; accumulate d(out) --------------
    def pass1(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(pl.multiple_of(i * hc * w, 128), n)],
            dych, sem_dy)
        cp_dy.start()
        _dma_x_window(x_hbm, b, xw, sem_in, i, nchunks, hc, h, w, dtype,
                      halo=2)
        ln, _, _ = _ln_flat(xw[:].astype(f32), scale, bias, eps)
        ln = ln.astype(dtype)
        rmask4 = _row_mask(r0, hc, h, w, n4, halo=2)
        yv = jax.lax.dot_general(wv, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        buf4[:, pl.ds(p, n4)] = jnp.where(rmask4, yv, 0.0).astype(dtype)
        v = _dw_shift_acc(buf4, tv_ref, masks2, p, w, n2, dtype)
        outs = jax.lax.dot_general(ablk_s[:], v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        out = jax.lax.dot_general(wpo, outs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32).astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        yv2 = jax.lax.dot_general(wkvv, out, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        buf2[:, pl.ds(p, n2)] = jnp.where(rmask2, yv2, 0.0).astype(dtype)
        vf = _dw_shift_acc(buf2, tv2_ref, masks, p, w, n, dtype)
        vfd = vf.astype(dtype)
        outf = jax.lax.dot_general(ablk_s[:], vf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        cp_dy.wait()
        dyd = dych[:]
        dwpof_ref[:, :] += jax.lax.dot_general(
            outf, dyd, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        doutf = jax.lax.dot_general(wpof, dyd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        da_s[:, :] += jax.lax.dot_general(
            doutf, vf, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dvf = jax.lax.dot_general(ablk_s[:], doutf, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        dvfd = dvf.astype(dtype)
        dtg[:, pl.ds(p + w, n)] = dvfd
        for k_, (dh, dw) in enumerate(
                ((a_, b_) for a_ in range(3) for b_ in range(3))):
            s = p + dh * w + dw - 1
            term = buf2[:, pl.ds(s, n)].astype(f32) * dvf
            if masks[dw] is not None:
                term = term * masks[dw]
            dtv2_ref[:, k_:k_ + 1] += jnp.sum(term, axis=1, keepdims=True)
        dyv2 = _dw_shift_transpose(dtg, tv2_ref, tmasks2, p, w, n2)
        dyv2 = jnp.where(rmask2, dyv2, 0.0).astype(dtype)
        dwkvv_ref[:, :] += jax.lax.dot_general(
            out, dyv2, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dout = jax.lax.dot_general(wkvv, dyv2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        douts[:, pl.ds(pl.multiple_of(r0 * w, 128), n2)] += dout.astype(
            douts.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, pass1, 0)

    # ---- pass 2: out_s / v backward; accumulate dA and dLN -------------
    def pass2(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        _dma_x_window(x_hbm, b, xw2, sem_in, i, nchunks, hc, h, w,
                      dtype, halo=1)
        ln, _, _ = _ln_flat(xw2[:].astype(f32), scale, bias, eps)
        ln = ln.astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        yv = jax.lax.dot_general(wv, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        buf2[:, pl.ds(p, n2)] = jnp.where(rmask2, yv, 0.0).astype(dtype)
        v = _dw_shift_acc(buf2, tv_ref, masks, p, w, n, dtype)
        vd = v.astype(dtype)
        outs = jax.lax.dot_general(ablk_s[:], v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        doutd = douts[:, pl.ds(pl.multiple_of((i * hc + 1) * w, 128), n)]
        dwpo_ref[:, :] += jax.lax.dot_general(
            outs, doutd, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dout_s = jax.lax.dot_general(wpo, doutd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        da_s[:, :] += jax.lax.dot_general(
            dout_s, v, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dv = jax.lax.dot_general(ablk_s[:], dout_s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dvd = dv.astype(dtype)
        dtg[:, pl.ds(p + w, n)] = dvd
        for k_, (dh, dw) in enumerate(
                ((a_, b_) for a_ in range(3) for b_ in range(3))):
            s = p + dh * w + dw - 1
            term = buf2[:, pl.ds(s, n)].astype(f32) * dv
            if masks[dw] is not None:
                term = term * masks[dw]
            dtv_ref[:, k_:k_ + 1] += jnp.sum(term, axis=1, keepdims=True)
        dyv = _dw_shift_transpose(dtg, tv_ref, tmasks2, p, w, n2)
        dyv = jnp.where(rmask2, dyv, 0.0).astype(dtype)
        dwv_ref[:, :] += jax.lax.dot_general(
            ln, dyv, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dxl[:, pl.ds(base0, n2)] += jax.lax.dot_general(
            wv, dyv, (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dxl.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, pass2, 0)

    # ---- epilogue: softmax / normalization backward on the smalls ------
    da = da_s[:]
    a = ablk_s[:]
    ds_ = a * (da - jnp.sum(da * a, axis=1, keepdims=True))
    dtemp_ref[:, :] += jax.lax.dot_general(
        sel, jnp.sum(ds_ * ghat, axis=1, keepdims=True),
        (((1,), (0,)), ((), ())), preferred_element_type=f32)
    dghat = ds_ * temp_col
    m_s[:] = dghat * rq * rk_row
    ones = jnp.zeros((c, 1), f32) + 1.0
    t_q = dghat * g * rk_row
    ai = jnp.sum(t_q, axis=1, keepdims=True)
    dsq_s[:] = jnp.where(sq_ref[:] > _EPS2,
                         -0.5 * ai * rq * rq * rq, 0.0)
    t_k = dghat * g * rq
    bi = jax.lax.dot_general(t_k, ones, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)
    rk = jax.lax.rsqrt(jnp.maximum(sk_ref[:], _EPS2))
    dsk_s[:] = jnp.where(sk_ref[:] > _EPS2,
                         -0.5 * bi * rk * rk * rk, 0.0)

    # ---- pass 3: q / k backward -----------------------------------------
    # buf4 held n4-length yv in pass 1; pass 3 stores n2-length yk, and the
    # shift slices read one lane past p+n2 — clear the stale band first
    buf4[:, pl.ds(p + n2, n4 - n2)] = jnp.zeros((c, n4 - n2), dtype)

    def pass3(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        _dma_x_window(x_hbm, b, xw2, sem_in, i, nchunks, hc, h, w,
                      dtype, halo=1)
        ln, _, _ = _ln_flat(xw2[:].astype(f32), scale, bias, eps)
        ln = ln.astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        yq = jax.lax.dot_general(wq, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        buf2[:, pl.ds(p, n2)] = jnp.where(rmask2, yq, 0.0).astype(dtype)
        q = _dw_shift_acc(buf2, tq_ref, masks, p, w, n, dtype)
        yk = jax.lax.dot_general(wk, ln, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        buf4[:, pl.ds(p, n2)] = jnp.where(rmask2, yk, 0.0).astype(dtype)
        k_v = _dw_shift_acc(buf4, tk_ref, masks, p, w, n, dtype)
        qd, kd = q.astype(dtype).astype(f32), k_v.astype(dtype).astype(f32)
        dq = jax.lax.dot_general(m_s[:], kd, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32) \
            + 2.0 * dsq_s[:] * qd
        dk = jax.lax.dot_general(m_s[:], qd, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32) \
            + 2.0 * dsk_s[:] * kd
        dxl_c = None
        for buf, dval, taps, dtaps, wgt, dwgt in (
                (buf2, dq, tq_ref, dtq_ref, wq, dwq_ref),
                (buf4, dk, tk_ref, dtk_ref, wk, dwk_ref)):
            dvald = dval.astype(dtype)
            dtg[:, pl.ds(p + w, n)] = dvald
            for k_, (dh, dw) in enumerate(
                    ((a_, b_) for a_ in range(3) for b_ in range(3))):
                s = p + dh * w + dw - 1
                term = buf[:, pl.ds(s, n)].astype(f32) * dval
                if masks[dw] is not None:
                    term = term * masks[dw]
                dtaps[:, k_:k_ + 1] += jnp.sum(term, axis=1, keepdims=True)
            dy1 = _dw_shift_transpose(dtg, taps, tmasks2, p, w, n2)
            dy1 = jnp.where(rmask2, dy1, 0.0).astype(dtype)
            dwgt[:, :] += jax.lax.dot_general(
                ln, dy1, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            d = jax.lax.dot_general(wgt, dy1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            dxl_c = d if dxl_c is None else dxl_c + d
        dxl[:, pl.ds(base0, n2)] += dxl_c.astype(dxl.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, pass3, 0)

    # ---- pass 4: LayerNorm backward -> dx -------------------------------
    def pass4(i, _):
        base0 = pl.multiple_of(i * hc * w, 128)
        base1 = pl.multiple_of((i * hc + 1) * w, 128)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base0, n)], dych, sem_dy)
        cp_dy.start()
        cp_x = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(base0, n)], xw2.at[:, pl.ds(0, n)], sem_in)
        cp_x.start()
        cp_x.wait()
        xf = xw2[:, pl.ds(0, n)].astype(f32)
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        dln = dxl[:, pl.ds(base1, n)].astype(f32)
        dscale_ref[:, :] += jnp.sum(dln * xhat, axis=1, keepdims=True)
        dbias_ref[:, :] += jnp.sum(dln, axis=1, keepdims=True)
        ds2 = dln * scale
        dxln = rstd * (ds2 - jnp.mean(ds2, axis=0, keepdims=True)
                       - xhat * jnp.mean(ds2 * xhat, axis=0, keepdims=True))
        cp_dy.wait()
        stage[:] = dych[:] + dxln.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, dx_hbm.at[b, :, pl.ds(base0, n)], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, nchunks, pass4, 0)


def _consts(c: int, nh: int):
    """Host-built head-structure constants: selector (nh, C) and block
    mask (C, C) — heads split channels contiguously (heads() reshape)."""
    ch = c // nh
    ids = np.arange(c) // ch
    sel = (ids[None, :] == np.arange(nh)[:, None]).astype(np.float32)
    blk = (ids[:, None] == ids[None, :]).astype(np.float32)
    return jnp.asarray(sel), jnp.asarray(blk)


def _split_weights(scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
                   w_pof, nh):
    c = w_qkv.shape[0]
    taps = t_qkv.reshape(9, 3 * c).T          # (3C, 9)
    taps2 = t_kv.reshape(9, 2 * c).T          # (2C, 9)
    sel, blk = _consts(c, nh)
    return (scale.reshape(c, 1), bias.reshape(c, 1),
            w_qkv[:, :c], w_qkv[:, c:2 * c], w_qkv[:, 2 * c:],
            taps[:c], taps[c:2 * c], taps[2 * c:],
            temp.reshape(nh, 1), sel, blk,
            w_po, w_kv[:, c:], taps2[c:], w_pof)


def _fwd_call(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof,
              nh, eps, interpret):
    bsz, c, h, w = x.shape
    hc = pick_hc(h, w, c)
    n2, n4 = (hc + 2) * w, (hc + 4) * w
    p = w + 128
    f32 = jnp.float32
    kern = functools.partial(_fwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    args = _split_weights(scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                          t_kv, w_pof, nh)
    nhh = args[8].shape[0]
    y, g, sq, sk = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((c, c)), _vmem_full((c, c)), _vmem_full((c, c)),
            _vmem_full((c, 9)), _vmem_full((c, 9)), _vmem_full((c, 9)),
            _vmem_full((nhh, 1)), _vmem_full((nhh, c)), _vmem_full((c, c)),
            _vmem_full((c, c)), _vmem_full((c, c)), _vmem_full((c, 9)),
            _vmem_full((c, c)),
        ],
        out_specs=[
            _any_spec(),
            pl.BlockSpec((c, c), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((bsz * c, c), f32),
            jax.ShapeDtypeStruct((bsz * c, 1), f32),
            jax.ShapeDtypeStruct((bsz * c, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, (h + 4) * w), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((c, n4 + 2 * p), x.dtype),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, hc * w), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), *args)
    return y.reshape(x.shape), g, sq, sk


def _bwd_call(x, dy, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
              w_pof, g, sq, sk, nh, eps, interpret):
    bsz, c, h, w = x.shape
    hc = pick_hc(h, w, c)
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    args = _split_weights(scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                          t_kv, w_pof, nh)
    nhh = args[8].shape[0]
    cc = _vmem_full((c, c))
    c1 = _vmem_full((c, 1))
    c9 = _vmem_full((c, 9))
    outs = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(), _any_spec(),
            c1, c1, cc, cc, cc, c9, c9, c9,
            _vmem_full((nhh, 1)), _vmem_full((nhh, c)), cc,
            cc, cc, c9, cc,
            pl.BlockSpec((c, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            _any_spec(),
            c1, c1, cc, cc, cc, c9, c9, c9,
            _vmem_full((nhh, 1)), cc, cc, c9, cc,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, 9), f32),
            jax.ShapeDtypeStruct((c, 9), f32),
            jax.ShapeDtypeStruct((c, 9), f32),
            jax.ShapeDtypeStruct((nhh, 1), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, 9), f32),
            jax.ShapeDtypeStruct((c, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, n4), x.dtype),
            pltpu.VMEM((c, n2), x.dtype),
            pltpu.VMEM((c, (h + 2) * w), x.dtype),
            pltpu.VMEM((c, (h + 2) * w), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((c, n4 + 2 * p), x.dtype),
            pltpu.VMEM((c, n + 2 * (p + w)), x.dtype),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, 1), f32),
            pltpu.VMEM((c, 1), f32),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), dy.reshape(bsz, c, h * w), *args,
      g, sq, sk)
    (dx, dsc, dbi, dwq, dwk, dwv, dtq, dtk, dtv, dtemp, dwpo, dwkvv,
     dtv2, dwpof) = outs
    dw_qkv = jnp.concatenate([dwq, dwk, dwv], axis=1)
    dt_qkv = jnp.concatenate([dtq, dtk, dtv], axis=0).T.reshape(3, 3, 3 * c)
    dw_kv = jnp.concatenate([jnp.zeros((c, c), f32), dwkvv], axis=1)
    dt_kv = jnp.concatenate([jnp.zeros((c, 9), f32), dtv2],
                            axis=0).T.reshape(3, 3, 2 * c)
    return (dx.reshape(x.shape), dsc.reshape(c), dbi.reshape(c),
            dw_qkv, dt_qkv, dtemp.reshape(1, -1, 1, 1), dwpo, dw_kv,
            dt_kv, dwpof)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _fused_ln_mdta(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
                   w_pof, nh, eps, interpret):
    y, _, _, _ = _fwd_call(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                           t_kv, w_pof, nh, eps, interpret)
    return y


def _vjp_fwd(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof,
             nh, eps, interpret):
    y, g, sq, sk = _fwd_call(x, scale, bias, w_qkv, t_qkv, temp, w_po,
                             w_kv, t_kv, w_pof, nh, eps, interpret)
    return y, (x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
               w_pof, g, sq, sk)


def _vjp_bwd(nh, eps, interpret, res, dy):
    (x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof,
     g, sq, sk) = res
    (dx, dsc, dbi, dw_qkv, dt_qkv, dtemp, dwpo, dw_kv, dt_kv, dwpof) = \
        _bwd_call(x, dy, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                  t_kv, w_pof, g, sq, sk, nh, eps, interpret)
    return (dx, dsc.astype(scale.dtype), dbi.astype(bias.dtype),
            dw_qkv.astype(w_qkv.dtype), dt_qkv.astype(t_qkv.dtype),
            dtemp.astype(temp.dtype), dwpo.astype(w_po.dtype),
            dw_kv.astype(w_kv.dtype), dt_kv.astype(t_kv.dtype),
            dwpof.astype(w_pof.dtype))


_fused_ln_mdta.defvjp(_vjp_fwd, _vjp_bwd)


def fused_ln_mdta(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
                  w_pof, *, num_heads: int, eps: float = 1e-5,
                  interpret: bool | None = None):
    """``x + MDTA(LayerNorm(x))`` on channels-first ``(B, C, H, W)``.

    scale/bias: LN affine (C,); w_qkv: (C, 3C) 1x1; t_qkv: (3, 3, 3C)
    depthwise taps; temp: (1, nh, 1, 1); w_po / w_pof: (C, C); w_kv:
    (C, 2C) (kf half dead — zero grads); t_kv: (3, 3, 2C).  Weights may be
    f32 (cast in-kernel).  Reverse-mode AD only."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3], x.shape[1]):
        raise ValueError(f"fused_ln_mdta: unsupported shape {x.shape}")
    return _fused_ln_mdta(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                          t_kv, w_pof, int(num_heads), float(eps),
                          bool(interpret))

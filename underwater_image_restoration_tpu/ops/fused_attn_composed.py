"""Composed-matmul fused LN+MDTA kernel (Pallas TPU).

Same math and public signature as ``ops.fused_attn.fused_ln_mdta``
(``y = x + MDTA(LayerNorm_C(x))``, reference
``src/Models/SpectralTransformer.py:76-114,133`` including the dead
``attnf``/``kf``/``q1x1_1`` quirks), with the composed-contraction
structure proven on the GDFN half (``ops.fused_gdfn_banded``): every
1x1-conv -> depthwise-3x3 chain is linear∘linear, so both stages
collapse into ONE matmul against a 9-shifted stack of the chain input:

    q[g, p] = Σ_{k,c} Kq[(k,c), g] · lnshift_k[c, p],
    Kq[(k,c), g] = w_qkv[c, g] · tap[g, k]          (built host-side)

MDTA has four such chains — q, k, v from the LayerNorm output and vf
from ``out`` — and the first three SHARE one shifted stack.  Against
``fused_attn`` this trades 4 x 9 VPU shift-multiply-adds per chunk for
9 slice-copies + matmuls whose contraction dim is 9C (144/288) instead
of C (16/32): full MXU utilization instead of 12.5%, and the microbench
puts the identical transform on the GDFN half at ~2x fwd / ~3x fwd+bwd
(PERF_NOTES.md round 4).

Structure is otherwise ``fused_attn``'s: pass 1 accumulates the raw gram
G = q k^T and the row sums-of-squares Sq/Sk; an epilogue normalizes,
applies temperature and the block-masked softmax to produce the dense
block-diagonal ``Ablk``; pass 2 streams v -> attn@v -> project_out ->
(stack) -> vf -> attn@vf -> project_outf -> +x.  The backward saves only
(x, weights, G, Sq, Sk) and recomputes chunks in VMEM across four passes,
with the cotangent of each composed stack scattered back through
transposed shifts into dLN / d(out) whole-image accumulators (the same
frame arithmetic as ``fused_gdfn_banded``'s backward).

Numerics: identical materialization points to ``fused_attn`` EXCEPT that
the 1x1 outputs are no longer rounded to the compute dtype before the
depthwise taps (the composed matmul accumulates both stages in f32) and
stack cotangents round to the compute dtype before the scatter — in f32
compute the paths agree to reduction order (equality-pinned by
tests/test_fused_attn_composed.py); in bf16 the composed form is strictly
*more* accurate at the fusion points.  Reverse-mode AD only.

Dispatch: ``models.spectral_transformer.SpectralBlock`` routes here under
``UIRT_ATTN_COMPOSED`` (see ``_attn_composed_mode`` there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attn import _EPS2, _attn_from_stats, _consts, _eye
from .fused_block import (
    _any_spec,
    _col_masks,
    _scatter_taps_aligned,
    _dma_x_window,
    _ln_flat,
    _row_mask,
    _vmem_full,
    _zero_guards,
    _TAPS,
    _w_ok,
)
from .fused_gdfn_banded import _build_k, _decompose_dk


def pick_hc(h: int, w: int, c: int) -> int:
    """Row chunk: the (9C, hc·W) stack + its f32 cotangent-dtype twin +
    ~8 live f32 (C, (hc+2)·W) chunk tensors within ~7 MB (the whole-image
    x / dLN / d(out) residents are budgeted separately in supports)."""
    from .fused_block import _hc_force

    forced = _hc_force(h, "attn")
    if forced is not None:
        return forced
    # Budget = chunk set + the two whole-image residents against the 16 MB
    # scoped-VMEM limit with ~2 MB transient headroom: hc=32 at C=16@256²
    # (13.5 MB total) is hardware-proven (-10% on the isolated kernel,
    # round 5) while C=32@256² at hc=32 (18.6 MB) correctly falls back —
    # the flat 7 MB chunk-only budget used to reject the proven case.
    img = c * (h + 2) * w * 2
    for hc in (32, 16, 8):
        if h % hc:
            continue
        n2 = (hc + 2) * w
        chunk = (9 * c * n2 * 2 + 9 * c * hc * w * 2 + 8 * c * n2 * 4
                 + c * (hc * w + 2 * w) * 4)   # acc scatter frame
        if chunk + 2 * img <= 14 * 1024 * 1024:
            return hc
    return 8


def supports(h: int, w: int, c: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate: same whole-image residency model as ``fused_attn``
    (fwd keeps x, bwd keeps dLN + d(out) per image in VMEM) plus the
    composed stack's chunk set."""
    if not _w_ok(w) or h % 8:
        return False
    if c is None:
        return True
    if c % 8:
        return False
    from .fused_block import _hc_force

    if _hc_force(h, "attn") is not None:
        return True  # A/B override: let Mosaic's own VMEM check decide
    # Gate on the FLOOR chunk (hc=8) at the original conservative 12 MB
    # bound — this keeps the dispatch set exactly what rounds 4-5 proved
    # on hardware (C=16 full-res yes, C=32@256² stays on the banded
    # kernel).  pick_hc separately maximizes hc under a 14 MB total bound
    # for the shapes admitted here.
    img = c * (h + 2) * w * itemsize
    n2 = 10 * w
    chunk = 9 * c * n2 * itemsize + 9 * c * 8 * w * itemsize \
        + 8 * c * n2 * 4 + c * (8 * w + 2 * w) * 4  # acc scatter frame
    return 2 * img + chunk <= 12 * 1024 * 1024


def _stack(s_ref, buf, masks, c: int, p: int, w: int, nq: int, dtype):
    """S[(k,c), q] = bufshift_k[c, q] for q in [0, nq) — 9 statically-
    offset slices of a guard-padded flat buffer whose q-origin is offset
    p + w; column-wrapping shifts masked to zero (zero-pad semantics).
    masks must be _col_masks(w, nq, dtype) — the compute-dtype 0/1
    multiply is exact and skips the f32 cast round-trip per element."""
    del dtype
    from .fused_block import _kabl

    if _kabl("nostack"):  # timing-only: matmuls consume stale scratch
        return
    for k, (dh, dw) in enumerate(_TAPS):
        sl = buf[:, pl.ds(p + dh * w + dw - 1, nq)]
        if masks[dw] is not None:
            sl = sl * masks[dw]
        s_ref[k * c:(k + 1) * c, pl.ds(0, nq)] = sl


def _fwd_kernel(x_hbm, scale_ref, bias_ref, kq_ref, kk_ref, kv_ref,
                temp_ref, sel_ref, blk_ref, wpo_ref, kvf_ref, wpof_ref,
                out_hbm, g_ref, sq_ref, sk_ref,
                xp, lnbuf, obuf, s_ref, ablk_s, stage, sem_in, sem_out, *,
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
    _zero_guards(lnbuf, p, n4, dtype)
    # the stats pass writes only [p, p+n2) of lnbuf but the dw=2 tap slice
    # reads one lane past it — zero the n2..n4 band so the masked (finite *
    # 0) product stays finite (uninitialized VMEM may hold NaNs)
    lnbuf[:, pl.ds(p + n2, n4 - n2)] = jnp.zeros((c, n4 - n2), dtype)
    _zero_guards(obuf, p, n2, dtype)
    g_ref[:] = jnp.zeros((c, c), f32)
    sq_ref[:] = jnp.zeros((c, 1), f32)
    sk_ref[:] = jnp.zeros((c, 1), f32)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    kq = kq_ref[:].astype(dtype)
    kk = kk_ref[:].astype(dtype)
    kv = kv_ref[:].astype(dtype)
    kvf = kvf_ref[:].astype(dtype)
    wpo = wpo_ref[:].astype(dtype)
    wpof = wpof_ref[:].astype(dtype)
    masks = _col_masks(w, n, dtype)
    masks2 = _col_masks(w, n2, dtype)
    cp_in.wait()

    def stats_chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        # dynamic lane offsets must be provably 128-aligned (Mosaic
        # rejects otherwise); at W=64 the row-1 origin (i*hc+1)*W is only
        # W-aligned, so load the aligned enclosing window and slice the
        # halo-1 frame out statically
        if w % 128 == 0:
            base1 = pl.multiple_of((i * hc + 1) * w, 128)
            xh = xp[:, pl.ds(base1, n2)].astype(f32)
        else:
            base0 = pl.multiple_of(i * hc * w, 128)
            xh = xp[:, pl.ds(base0, n4)][:, w:w + n2].astype(f32)
        ln, _, _ = _ln_flat(xh, scale, bias, eps)
        rmask = _row_mask(r0, hc, h, w, n2)
        lnbuf[:, pl.ds(p, n2)] = jnp.where(rmask, ln, 0.0).astype(dtype)
        _stack(s_ref, lnbuf, masks, c, p, w, n, dtype)
        s = s_ref[:, pl.ds(0, n)]
        q = jax.lax.dot_general(kq, s, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(dtype)
        k = jax.lax.dot_general(kk, s, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32).astype(dtype)
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
        rmask4 = _row_mask(r0, hc, h, w, n4, halo=2)
        lnbuf[:, pl.ds(p, n4)] = jnp.where(rmask4, ln, 0.0).astype(dtype)
        _stack(s_ref, lnbuf, masks2, c, p, w, n2, dtype)
        v = jax.lax.dot_general(kv, s_ref[:, pl.ds(0, n2)],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)          # f32
        outs = jax.lax.dot_general(ablk_s[:], v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        out = jax.lax.dot_general(wpo, outs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32).astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        obuf[:, pl.ds(p, n2)] = jnp.where(
            rmask2, out.astype(f32), 0.0).astype(dtype)
        _stack(s_ref, obuf, masks, c, p, w, n, dtype)
        vf = jax.lax.dot_general(kvf, s_ref[:, pl.ds(0, n)],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)         # f32
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


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, kq_ref, kk_ref, kv_ref,
                temp_ref, sel_ref, blk_ref, wpo_ref, kvf_ref, wpof_ref,
                g_ref, sq_ref, sk_ref,
                dx_hbm, dscale_ref, dbias_ref, dkq_ref, dkk_ref, dkv_ref,
                dtemp_ref, dwpo_ref, dkvf_ref, dwpof_ref,
                xw, xw2, douts, dxl, lnbuf, obuf, s_ref, dlnacc,
                accl, accr,
                da_s, ablk_s, m_s, dsq_s, dsk_s, dych, stage,
                sem_in, sem_dy, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype):
    c = scale_ref.shape[0]
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dkq_ref, dkk_ref, dkv_ref,
                    dtemp_ref, dwpo_ref, dkvf_ref, dwpof_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    douts[:] = jnp.zeros(douts.shape, douts.dtype)
    dxl[:] = jnp.zeros(dxl.shape, dxl.dtype)
    da_s[:] = jnp.zeros((c, c), f32)
    _zero_guards(lnbuf, p, n4, dtype)
    # passes 2/3 write only [p, p+n2) — pre-zero the n2..n4 band (see the
    # forward kernel's matching note; pass 1's n4 writes refresh it, and
    # later passes' overrunning tap slice then reads stale-but-finite
    # values that the column mask zeroes)
    lnbuf[:, pl.ds(p + n2, n4 - n2)] = jnp.zeros((c, n4 - n2), dtype)
    _zero_guards(obuf, p, n2, dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    kq = kq_ref[:].astype(dtype)
    kk = kk_ref[:].astype(dtype)
    kv = kv_ref[:].astype(dtype)
    kvf = kvf_ref[:].astype(dtype)
    wpo = wpo_ref[:].astype(dtype)
    wpof = wpof_ref[:].astype(dtype)
    masks = _col_masks(w, n, dtype)
    masks2 = _col_masks(w, n2, dtype)
    masks_ext = _col_masks(w, n + 2 * w)  # f32: aligned scatter frames
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

    # ---- pass 1: outf-branch backward; accumulate dA and d(out) ---------
    def pass1(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base0, n)], dych, sem_dy)
        cp_dy.start()
        _dma_x_window(x_hbm, b, xw, sem_in, i, nchunks, hc, h, w, dtype,
                      halo=2)
        ln, _, _ = _ln_flat(xw[:].astype(f32), scale, bias, eps)
        rmask4 = _row_mask(r0, hc, h, w, n4, halo=2)
        lnbuf[:, pl.ds(p, n4)] = jnp.where(rmask4, ln, 0.0).astype(dtype)
        _stack(s_ref, lnbuf, masks2, c, p, w, n2, dtype)
        v = jax.lax.dot_general(kv, s_ref[:, pl.ds(0, n2)],
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        outs = jax.lax.dot_general(ablk_s[:], v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        out = jax.lax.dot_general(wpo, outs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32).astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        obuf[:, pl.ds(p, n2)] = jnp.where(
            rmask2, out.astype(f32), 0.0).astype(dtype)
        _stack(s_ref, obuf, masks, c, p, w, n, dtype)
        sout = s_ref[:, pl.ds(0, n)]
        vf = jax.lax.dot_general(kvf, sout, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
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
        dkvf_ref[:, :] += jax.lax.dot_general(
            sout, dvfd, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        ds = jax.lax.dot_general(kvf, dvfd, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(dtype)
        dlnacc[:] = jnp.zeros(dlnacc.shape, f32)
        _scatter_taps_aligned(lambda k: ds[k * c:(k + 1) * c, :],
                              dlnacc, accl, accr, masks_ext, c, w, n)
        douts[:, pl.ds(base0, n2)] += dlnacc[:, pl.ds(128, n2)].astype(
            douts.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, pass1, 0)

    # ---- pass 2: out_s / v backward; accumulate dA and dLN --------------
    def pass2(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        _dma_x_window(x_hbm, b, xw2, sem_in, i, nchunks, hc, h, w,
                      dtype, halo=1 if w % 128 == 0 else 2)
        ln, _, _ = _ln_flat(
            xw2[:, pl.ds(0 if w % 128 == 0 else w, n2)].astype(f32),
            scale, bias, eps)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        lnbuf[:, pl.ds(p, n2)] = jnp.where(rmask2, ln, 0.0).astype(dtype)
        _stack(s_ref, lnbuf, masks, c, p, w, n, dtype)
        s = s_ref[:, pl.ds(0, n)]
        v = jax.lax.dot_general(kv, s, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        outs = jax.lax.dot_general(ablk_s[:], v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        if w % 128 == 0:
            doutd = douts[:, pl.ds(pl.multiple_of((i * hc + 1) * w, 128),
                                   n)]
        else:  # aligned enclosing window + static slice (see stats_chunk)
            doutd = douts[:, pl.ds(base0, n2)][:, w:w + n]
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
        dkv_ref[:, :] += jax.lax.dot_general(
            s, dvd, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        ds = jax.lax.dot_general(kv, dvd, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32).astype(dtype)
        dlnacc[:] = jnp.zeros(dlnacc.shape, f32)
        _scatter_taps_aligned(lambda k: ds[k * c:(k + 1) * c, :],
                              dlnacc, accl, accr, masks_ext, c, w, n)
        dxl[:, pl.ds(base0, n2)] += dlnacc[:, pl.ds(128, n2)].astype(
            dxl.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, pass2, 0)

    # ---- epilogue: softmax / normalization backward on the smalls -------
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

    # ---- pass 3: q / k backward ------------------------------------------
    def pass3(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        _dma_x_window(x_hbm, b, xw2, sem_in, i, nchunks, hc, h, w,
                      dtype, halo=1 if w % 128 == 0 else 2)
        ln, _, _ = _ln_flat(
            xw2[:, pl.ds(0 if w % 128 == 0 else w, n2)].astype(f32),
            scale, bias, eps)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        lnbuf[:, pl.ds(p, n2)] = jnp.where(rmask2, ln, 0.0).astype(dtype)
        _stack(s_ref, lnbuf, masks, c, p, w, n, dtype)
        s = s_ref[:, pl.ds(0, n)]
        q = jax.lax.dot_general(kq, s, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        k_v = jax.lax.dot_general(kk, s, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        qd = q.astype(dtype).astype(f32)
        kd = k_v.astype(dtype).astype(f32)
        dq = jax.lax.dot_general(m_s[:], kd, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32) \
            + 2.0 * dsq_s[:] * qd
        dk = jax.lax.dot_general(m_s[:], qd, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32) \
            + 2.0 * dsk_s[:] * kd
        dqd = dq.astype(dtype)
        dkd = dk.astype(dtype)
        dkq_ref[:, :] += jax.lax.dot_general(
            s, dqd, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dkk_ref[:, :] += jax.lax.dot_general(
            s, dkd, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        ds = (jax.lax.dot_general(kq, dqd, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
              + jax.lax.dot_general(kk, dkd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)).astype(
            dtype)
        dlnacc[:] = jnp.zeros(dlnacc.shape, f32)
        _scatter_taps_aligned(lambda k: ds[k * c:(k + 1) * c, :],
                              dlnacc, accl, accr, masks_ext, c, w, n)
        dxl[:, pl.ds(base0, n2)] += dlnacc[:, pl.ds(128, n2)].astype(
            dxl.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, pass3, 0)

    # ---- pass 4: LayerNorm backward -> dx --------------------------------
    def pass4(i, _):
        base0 = pl.multiple_of(i * hc * w, 128)
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
        if w % 128 == 0:
            dln = dxl[:, pl.ds(pl.multiple_of((i * hc + 1) * w, 128),
                               n)].astype(f32)
        else:  # aligned enclosing window + static slice (see stats_chunk)
            dln = dxl[:, pl.ds(base0, n2)][:, w:w + n].astype(f32)
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


def _split_weights(scale, bias, w_qkv, t_qkv, temp, w_kv, t_kv, nh):
    """Host-side composition into the kernel's operands: Kq/Kk/Kv from the
    qkv chain, Kvf from the live (vf) half of the kv chain."""
    c = w_qkv.shape[0]
    taps = t_qkv.reshape(9, 3 * c).T          # (3C, 9)
    taps2 = t_kv.reshape(9, 2 * c).T          # (2C, 9)
    sel, blk = _consts(c, nh)
    kq = _build_k(w_qkv[:, :c], taps[:c])
    kk = _build_k(w_qkv[:, c:2 * c], taps[c:2 * c])
    kv = _build_k(w_qkv[:, 2 * c:], taps[2 * c:])
    kvf = _build_k(w_kv[:, c:], taps2[c:])
    return (scale.reshape(c, 1), bias.reshape(c, 1), kq, kk, kv,
            temp.reshape(nh, 1), sel, blk, kvf)


def _fwd_call(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof,
              nh, eps, interpret):
    bsz, c, h, w = x.shape
    hc = pick_hc(h, w, c)
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    f32 = jnp.float32
    kern = functools.partial(_fwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    (sc, bi, kq, kk, kv, tc, sel, blk, kvf) = _split_weights(
        scale, bias, w_qkv, t_qkv, temp, w_kv, t_kv, nh)
    nhh = tc.shape[0]
    k9 = _vmem_full((9 * c, c))
    y, g, sq, sk = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            k9, k9, k9,
            _vmem_full((nhh, 1)), _vmem_full((nhh, c)), _vmem_full((c, c)),
            _vmem_full((c, c)), k9, _vmem_full((c, c)),
        ],
        out_specs=[
            _any_spec(),
            pl.BlockSpec((c, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((bsz * c, c), f32),
            jax.ShapeDtypeStruct((bsz * c, 1), f32),
            jax.ShapeDtypeStruct((bsz * c, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, (h + 4) * w), x.dtype),
            pltpu.VMEM((c, n4 + 2 * p), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((9 * c, n2), x.dtype),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), sc, bi, kq, kk, kv, tc, sel, blk,
      w_po, kvf, w_pof)
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
    (sc, bi, kq, kk, kv, tc, sel, blk, kvf) = _split_weights(
        scale, bias, w_qkv, t_qkv, temp, w_kv, t_kv, nh)
    nhh = tc.shape[0]
    cc = _vmem_full((c, c))
    c1 = _vmem_full((c, 1))
    k9 = _vmem_full((9 * c, c))
    outs = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(), _any_spec(),
            c1, c1, k9, k9, k9,
            _vmem_full((nhh, 1)), _vmem_full((nhh, c)), cc,
            cc, k9, cc,
            pl.BlockSpec((c, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            _any_spec(),
            c1, c1, k9, k9, k9,
            _vmem_full((nhh, 1)), cc, k9, cc,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((9 * c, c), f32),
            jax.ShapeDtypeStruct((9 * c, c), f32),
            jax.ShapeDtypeStruct((9 * c, c), f32),
            jax.ShapeDtypeStruct((nhh, 1), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((9 * c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, n4), x.dtype),
            # xw2: halo-1 frame, fetched via a halo-2 aligned DMA
            # window at W=64 (see _dma_x_window alignment note)
            pltpu.VMEM((c, n2 if w % 128 == 0 else n4), x.dtype),
            pltpu.VMEM((c, (h + 2) * w), x.dtype),
            pltpu.VMEM((c, (h + 2) * w), x.dtype),
            pltpu.VMEM((c, n4 + 2 * p), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((9 * c, n2), x.dtype),
            pltpu.VMEM((c, n2 + 256), f32),
            pltpu.VMEM((c, n + 2 * w), f32),   # accl (aligned scatter)
            pltpu.VMEM((c, n + 2 * w), f32),   # accr (aligned scatter)
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
    )(x.reshape(bsz, c, h * w), dy.reshape(bsz, c, h * w),
      sc, bi, kq, kk, kv, tc, sel, blk, w_po, kvf, w_pof, g, sq, sk)
    (dx, dsc, dbi, dkq, dkk, dkv, dtemp, dwpo, dkvf, dwpof) = outs
    taps = t_qkv.reshape(9, 3 * c).T
    taps2 = t_kv.reshape(9, 2 * c).T
    dwq, dtq = _decompose_dk(dkq, w_qkv[:, :c], taps[:c])
    dwk, dtk = _decompose_dk(dkk, w_qkv[:, c:2 * c], taps[c:2 * c])
    dwv, dtv = _decompose_dk(dkv, w_qkv[:, 2 * c:], taps[2 * c:])
    dwvf, dtvf = _decompose_dk(dkvf, w_kv[:, c:], taps2[c:])
    dw_qkv = jnp.concatenate([dwq, dwk, dwv], axis=1)
    dt_qkv = jnp.concatenate([dtq, dtk, dtv], axis=0).T.reshape(3, 3, 3 * c)
    dw_kv = jnp.concatenate([jnp.zeros((c, c), f32), dwvf], axis=1)
    dt_kv = jnp.concatenate([jnp.zeros((c, 9), f32), dtvf],
                            axis=0).T.reshape(3, 3, 2 * c)
    return (dx.reshape(x.shape), dsc.reshape(c), dbi.reshape(c),
            dw_qkv, dt_qkv, dtemp.reshape(1, -1, 1, 1), dwpo, dw_kv,
            dt_kv, dwpof)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _fused_ln_mdta_composed(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                            t_kv, w_pof, nh, eps, interpret):
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


_fused_ln_mdta_composed.defvjp(_vjp_fwd, _vjp_bwd)


def fused_ln_mdta_composed(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                           t_kv, w_pof, *, num_heads: int, eps: float = 1e-5,
                           interpret: bool | None = None):
    """``x + MDTA(LayerNorm(x))`` on channels-first ``(B, C, H, W)`` —
    composed-matmul variant (see module docstring).  Same signature and
    weight layouts as ``fused_attn.fused_ln_mdta``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3], x.shape[1],
                    jnp.dtype(x.dtype).itemsize):
        raise ValueError(f"fused_ln_mdta_composed: unsupported {x.shape}")
    return _fused_ln_mdta_composed(x, scale, bias, w_qkv, t_qkv, temp,
                                   w_po, w_kv, t_kv, w_pof, int(num_heads),
                                   float(eps), bool(interpret))

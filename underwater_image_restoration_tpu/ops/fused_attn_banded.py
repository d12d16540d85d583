"""Banded fused LN+MDTA kernel (Pallas TPU) — no whole-image VMEM.

Same math and public signature as ``ops.fused_attn.fused_ln_mdta`` /
``ops.fused_attn_composed`` (``y = x + MDTA(LayerNorm_C(x))``, reference
``src/Models/SpectralTransformer.py:76-114,133`` incl. the dead
``attnf``/``kf``/``q1x1_1`` quirks), re-banded so the 1024² reference
train resolution (``src/DataManipulation/DataLoader.py:13-20``) qualifies:

- **Forward**: two streaming passes over x from HBM (halo-windowed DMAs,
  ``_dma_x_window``) — pass 1 accumulates the raw gram G = q k^T and the
  row sums-of-squares Sq/Sk via the composed (9C)-contraction stack; an
  epilogue builds the block-diagonal dense ``Ablk``; pass 2 recomputes LN
  per chunk and runs v -> attn@v -> project_out -> vf -> attn@vf ->
  project_outf -> +x.  No whole-image x copy.

- **Backward**: the whole-image d(out)/dLN accumulators of the
  ``fused_attn*`` kernels become ROLLING LAG-1 pipelines (the
  ``fused_gdfn_banded`` trick): a chunk's scatter window only overlaps
  its neighbours by one row, so chunk i-1's cotangent is final as soon
  as chunk i's scatter lands.  The v-branch dLN partial still has to
  cross the softmax-backward barrier (q/k gradients need the fully
  accumulated dA), so loop 1 streams finalized dLN_v chunks out to an
  f32 HBM scratch plane that loop 2 reads back — O(C·H·W) extra HBM
  traffic instead of O(C·H·W) whole-image VMEM, which is exactly the
  trade a 33.6 MB 1024² image needs.  Loop 1 fuses the old passes 1+2
  (outf-branch + v-branch, carrying the previous chunk's composed stack
  and v); loop 2 fuses the old passes 3+4 (q/k backward + LayerNorm
  backward -> dx).

Single-consumer chains (vf forward, all stack-cotangent scatters and the
vf/v weight grads) use per-tap (C,C) matmul accumulates on slices of the
guard-padded buffers instead of materializing further (9C, n) stacks —
same flops, no extra VMEM.

Numerics: materialization points follow ``fused_attn_composed`` (1x1
outputs unrounded into the taps, stack cotangents rounded to the compute
dtype, dLN_v crosses HBM in f32).  In f32 compute the paths agree to
reduction order (tests/test_fused_attn_banded.py).  Reverse-mode AD only.

Dispatch: ``models.spectral_transformer.SpectralBlock`` routes here when
the whole-image composed kernel cannot fit (see ``_attn_composed_mode``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attn import _EPS2, _attn_from_stats, _eye
from .fused_attn_composed import _split_weights, _stack
from .fused_block import (
    _any_spec,
    _col_masks,
    _dma_x_window,
    _dma_x_window_start,
    _dma_x_window_wait,
    _ln_flat,
    _pipelined_loop,
    _row_mask,
    _vmem_full,
    _zero_guards,
    _TAPS,
    _w_ok,
)
from .fused_block import _scatter_taps_aligned
from .fused_gdfn_banded import _decompose_dk


def pick_hc(h: int, w: int, c: int) -> int:
    """Largest row chunk whose static scratch set fits ~13 MB (see
    supports); transient compute temps ride in the remaining headroom."""
    from .fused_block import _hc_force

    forced = _hc_force(h, "attnb")
    if forced is not None:
        return forced
    for hc in (32, 16, 8, 4):
        if h % hc:
            continue
        if _static_bytes(hc, w, c) <= 13 * 1024 * 1024:
            return hc
    return 4


def _static_bytes(hc: int, w: int, c: int, itemsize: int = 2) -> int:
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    # xw2/xw2b hold the halo-1 LN frame but are ALLOCATED at the aligned
    # halo-2 enclosure when W is not a 128-multiple (matches _fwd_call /
    # _bwd_call scratch_shapes — advisor r4 low).
    nx2 = n2 if w % 128 == 0 else n4
    return (
        c * n4 * itemsize                  # xw (loop-1 halo-2 window)
        + c * nx2 * itemsize               # xw2
        + c * (n4 + 2 * p) * itemsize      # lnbuf
        + c * (n2 + 2 * p) * itemsize      # obuf
        + 9 * c * n2 * itemsize            # s_ref
        + 9 * c * n * itemsize             # sprev
        + c * n * 4                        # vprev (f32)
        + 2 * c * (n2 + 256) * 4           # dlnacc / dlnacc2
        + 2 * c * (n + 2 * w) * 4          # accl/accr scatter frames
        + 2 * (c * n * 4 + c * w * 4)      # douts/dlnv pend + carry
        + c * n * 4                        # f32 stage (dlnv write / read)
        + 2 * c * n * itemsize             # dych + stage
        + c * n * itemsize                 # xprev
        # input-pipelining double buffers (xwb / xw2b / dychb, fwd + bwd)
        + c * n4 * itemsize + c * nx2 * itemsize + c * n * itemsize
        # headroom for Mosaic's live f32 chunk temps: hardware measured
        # the hc=8 backward at C=32/512² 1.39 MB over the 16 MB scoped
        # limit with a 4x term — 10x keeps the model honest
        + 10 * c * n2 * 4
    )


def supports(h: int, w: int, c: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate: no whole-image terms — static scratch at the chosen
    chunk size only (the 1024² full-res levels qualify)."""
    if not _w_ok(w) or h % 8:
        return False
    if c is None:
        return True
    if c % 8:
        return False
    hc = pick_hc(h, w, c)
    # ~16 MB VMEM; _static_bytes already carries a 4x f32-chunk headroom
    # term for Mosaic's transient live values
    return _static_bytes(hc, w, c, itemsize) <= 14.5 * 1024 * 1024


def _per_tap_matmul(kmat, buf, masks, c: int, p: int, w: int, n: int,
                    dtype):
    """y[g, q] = Σ_{k,c} K[(k,c), g] · bufshift_k[c, q] without
    materializing the stack: 9 (C,C)x(C,n) matmul accumulates on
    guard-padded buffer slices (masked like _stack).  f32 result."""
    acc = None
    for k, (dh, dw) in enumerate(_TAPS):
        sl = buf[:, pl.ds(p + dh * w + dw - 1, n)]
        if masks[dw] is not None:
            sl = sl * masks[dw]  # masks in compute dtype: 0/1 is exact
        term = jax.lax.dot_general(
            kmat[k * c:(k + 1) * c, :], sl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = term if acc is None else acc + term
    return acc


def _per_tap_wgrad(dkref, buf, dt, masks, c: int, p: int, w: int, n: int,
                   dtype):
    """dK[(k,c), g] += Σ_q bufshift_k[c, q] · dt[g, q] block by block."""
    for k, (dh, dw) in enumerate(_TAPS):
        sl = buf[:, pl.ds(p + dh * w + dw - 1, n)]
        if masks[dw] is not None:
            sl = sl * masks[dw]  # masks in compute dtype: 0/1 is exact
        dkref[k * c:(k + 1) * c, :] += jax.lax.dot_general(
            sl, dt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _per_tap_scatter(kmats_dts, dlnacc, accl, accr, masks_ext,
                     c: int, w: int, n: int):
    """dlnacc[off_k] += mask · Σ_j (K_j,k^T-block transform of dt_j):
    the stack cotangent scattered straight into the (C, n+2W+256) f32
    frame without the (9C, n) temp, via the lane-aligned per-direction
    form (fused_block._scatter_taps_aligned).  ``kmats_dts`` is a
    sequence of (kmat, dt) pairs summed per tap — the q/k loop shares
    one scatter."""
    def get_blk(k):
        acc = None
        for kmat, dt in kmats_dts:
            term = jax.lax.dot_general(
                kmat[k * c:(k + 1) * c, :], dt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
        return acc

    _scatter_taps_aligned(get_blk, dlnacc, accl, accr, masks_ext, c, w, n)


def _fwd_kernel(x_hbm, scale_ref, bias_ref, kq_ref, kk_ref, kv_ref,
                temp_ref, sel_ref, blk_ref, wpo_ref, kvf_ref, wpof_ref,
                out_hbm, g_ref, sq_ref, sk_ref,
                xw, xwb, xw2, xw2b, lnbuf, obuf, s_ref, ablk_s, stage,
                stageb, sem_in, sem_inb, sem_out, sem_outb, *,
                hc: int, h: int, w: int, eps: float, dtype):
    """Both streaming loops are lag-1 pipelined (see the gdfn_banded
    forward): chunk i+1's halo window streams in while chunk i computes,
    and the out-loop's output DMA is waited on only before its stage
    buffer's reuse two chunks later.  Slots unroll statically (chunks
    2j / 2j+1 -> buffer pairs), with a serial fallback for odd nchunks."""
    c = scale_ref.shape[0]
    n, n2, n4 = hc * w, (hc + 2) * w, (hc + 4) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    _zero_guards(lnbuf, p, n4, dtype)
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

    def stats_compute(i, xwin):
        r0 = pl.multiple_of(i * hc, hc)
        ln, _, _ = _ln_flat(
            xwin[:, pl.ds(0 if w % 128 == 0 else w, n2)].astype(f32),
            scale, bias, eps)
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

    # xw2 is a halo-1 LN frame, but at W=64 the HBM DMA window must be the
    # aligned halo-2 enclosure (odd x 64 slices violate Mosaic's
    # 128-multiple DMA rule; stats_compute slices the frame at offset w) —
    # mirror the bwd loop2's h2 (advisor r4 high: halo=1 here crashed every
    # W=64 banded-attn dispatch at trace time).
    h1 = 1 if w % 128 == 0 else 2
    _pipelined_loop(
        nchunks,
        lambda i, buf, sem: _dma_x_window_start(
            x_hbm, b, buf, sem, i, nchunks, hc, h, w, dtype, halo=h1),
        lambda i, buf, sem: _dma_x_window_wait(
            x_hbm, b, buf, sem, i, nchunks, hc, h, w, halo=h1),
        stats_compute, (xw2, sem_in), (xw2b, sem_inb))

    eyec = _eye(c)
    temp_col = jax.lax.dot_general(
        sel_ref[:].astype(f32), temp_ref[:].astype(f32),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    ablk, _, _, _ = _attn_from_stats(g_ref[:], sq_ref[:], sk_ref[:],
                                     temp_col, blk_ref[:], eyec)
    ablk_s[:] = ablk

    def out_compute(i, xwin, stg, sem_o):
        r0 = pl.multiple_of(i * hc, hc)
        base0 = pl.multiple_of(i * hc * w, 128)
        ln, _, _ = _ln_flat(xwin[:].astype(f32), scale, bias, eps)
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
        vf = _per_tap_matmul(kvf, obuf, masks, c, p, w, n, dtype)
        outf = jax.lax.dot_general(ablk_s[:], vf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        yout = jax.lax.dot_general(wpof, outf, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)
        stg[:] = xwin[:, pl.ds(2 * w, n)] + yout.astype(dtype)
        pltpu.make_async_copy(
            stg, out_hbm.at[b, :, pl.ds(base0, n)], sem_o).start()

    def out_wait(i, stg, sem_o):
        base0 = pl.multiple_of(i * hc * w, 128)
        pltpu.make_async_copy(
            stg, out_hbm.at[b, :, pl.ds(base0, n)], sem_o).wait()

    if nchunks % 2 or nchunks < 2:
        def out_chunk(i, _):
            _dma_x_window(x_hbm, b, xw, sem_in, i, nchunks, hc, h, w,
                          dtype, halo=2)
            out_compute(i, xw, stage, sem_out)
            out_wait(i, stage, sem_out)
            return 0

        jax.lax.fori_loop(0, nchunks, out_chunk, 0)
        return

    _dma_x_window_start(x_hbm, b, xw, sem_in, 0, nchunks, hc, h, w, dtype,
                        halo=2)

    def out_pair(j, _):
        i0 = 2 * j
        _dma_x_window_start(x_hbm, b, xwb, sem_inb, i0 + 1, nchunks, hc,
                            h, w, dtype, halo=2)
        _dma_x_window_wait(x_hbm, b, xw, sem_in, i0, nchunks, hc, h, w,
                           halo=2)

        @pl.when(j > 0)
        def _drain0():
            out_wait(i0 - 2, stage, sem_out)

        out_compute(i0, xw, stage, sem_out)

        @pl.when(i0 + 2 < nchunks)
        def _pre0():
            _dma_x_window_start(x_hbm, b, xw, sem_in, i0 + 2, nchunks, hc,
                                h, w, dtype, halo=2)

        _dma_x_window_wait(x_hbm, b, xwb, sem_inb, i0 + 1, nchunks, hc, h,
                           w, halo=2)

        @pl.when(j > 0)
        def _drain1():
            out_wait(i0 - 1, stageb, sem_outb)

        out_compute(i0 + 1, xwb, stageb, sem_outb)
        return 0

    jax.lax.fori_loop(0, nchunks // 2, out_pair, 0)
    out_wait(nchunks - 2, stage, sem_out)
    out_wait(nchunks - 1, stageb, sem_outb)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, kq_ref, kk_ref, kv_ref,
                temp_ref, sel_ref, blk_ref, wpo_ref, kvf_ref, wpof_ref,
                g_ref, sq_ref, sk_ref,
                dx_hbm, dlnv_hbm, dscale_ref, dbias_ref, dkq_ref, dkk_ref,
                dkv_ref, dtemp_ref, dwpo_ref, dkvf_ref, dwpof_ref,
                xw, xwb, xw2, xw2b, lnbuf, obuf, s_ref, sprev, vprev,
                dlnacc, dlnacc2, accl, accr,
                dopend, docarry, dlpend, dlcarry,
                f32stage, da_s, ablk_s, m_s, dsq_s, dsk_s,
                dych, dychb, stage, xprev,
                sem_in, sem_inb, sem_dy, sem_dyb, sem_out, sem_ln, *,
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

    da_s[:] = jnp.zeros((c, c), f32)
    dopend[:] = jnp.zeros(dopend.shape, f32)
    docarry[:] = jnp.zeros(docarry.shape, f32)
    dlpend[:] = jnp.zeros(dlpend.shape, f32)
    dlcarry[:] = jnp.zeros(dlcarry.shape, f32)
    _zero_guards(lnbuf, p, n4, dtype)
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
    masks_ext = _col_masks(w, n + 2 * w)  # f32 scatter frames
    masks = _col_masks(w, n, dtype)
    masks2 = _col_masks(w, n2, dtype)
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

    def _v_branch(j, doutd):
        """v-branch backward for chunk j given its complete d(out): uses
        the carried sprev (chunk-j composed stack) and vprev (chunk-j v,
        f32).  Scatters dLN_v into dlnacc2 and rolls the lag-1 dLN_v
        pipeline (write finalized chunk j-1 to the HBM scratch plane)."""
        outs_prev = jax.lax.dot_general(
            ablk_s[:], vprev[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype)
        dwpo_ref[:, :] += jax.lax.dot_general(
            outs_prev, doutd, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dout_s = jax.lax.dot_general(wpo, doutd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        da_s[:, :] += jax.lax.dot_general(
            dout_s, vprev[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dv = jax.lax.dot_general(ablk_s[:], dout_s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dvd = dv.astype(dtype)
        dkv_ref[:, :] += jax.lax.dot_general(
            sprev[:], dvd, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dlnacc2[:] = jnp.zeros(dlnacc2.shape, f32)
        _per_tap_scatter(((kv, dvd),), dlnacc2, accl, accr,
                         masks_ext, c, w, n)

        @pl.when(j > 0)
        def _roll():
            dlpend[:, pl.ds(n - w, w)] += dlnacc2[:, pl.ds(128, w)]
            f32stage[:] = dlpend[:]
            cp = pltpu.make_async_copy(
                f32stage,
                dlnv_hbm.at[b, :, pl.ds(pl.multiple_of((j - 1) * hc * w,
                                                       128), n)],
                sem_ln)
            cp.start()
            cp.wait()

        dlpend[:] = dlnacc2[:, pl.ds(128 + w, n)]
        dlpend[:, pl.ds(0, w)] += dlcarry[:]
        dlcarry[:] = dlnacc2[:, pl.ds(128 + w + n, w)]

    def start_dy(i, dyb, sem):
        base0 = pl.multiple_of(i * hc * w, 128)
        pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base0, n)], dyb, sem).start()

    def wait_dy(i, dyb, sem):
        base0 = pl.multiple_of(i * hc * w, 128)
        pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base0, n)], dyb, sem).wait()

    def loop1_core(i, xwin, dyb):
        r0 = pl.multiple_of(i * hc, hc)
        ln, _, _ = _ln_flat(xwin[:].astype(f32), scale, bias, eps)
        rmask4 = _row_mask(r0, hc, h, w, n4, halo=2)
        lnbuf[:, pl.ds(p, n4)] = jnp.where(rmask4, ln, 0.0).astype(dtype)
        _stack(s_ref, lnbuf, masks2, c, p, w, n2, dtype)
        v_full = jax.lax.dot_general(kv, s_ref[:, pl.ds(0, n2)],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        outs = jax.lax.dot_general(ablk_s[:], v_full,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        out = jax.lax.dot_general(wpo, outs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32).astype(dtype)
        rmask2 = _row_mask(r0, hc, h, w, n2)
        obuf[:, pl.ds(p, n2)] = jnp.where(
            rmask2, out.astype(f32), 0.0).astype(dtype)
        vf = _per_tap_matmul(kvf, obuf, masks, c, p, w, n, dtype)
        outf = jax.lax.dot_general(ablk_s[:], vf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32).astype(dtype)
        dyd = dyb[:]
        dwpof_ref[:, :] += jax.lax.dot_general(
            outf, dyd, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        doutf = jax.lax.dot_general(wpof, dyd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        da_s[:, :] += jax.lax.dot_general(
            doutf, vf, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dvf = jax.lax.dot_general(ablk_s[:], doutf, (((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        dvfd = dvf.astype(dtype)
        _per_tap_wgrad(dkvf_ref, obuf, dvfd, masks, c, p, w, n, dtype)
        dlnacc[:] = jnp.zeros(dlnacc.shape, f32)
        _per_tap_scatter(((kvf, dvfd),), dlnacc, accl, accr,
                         masks_ext, c, w, n)

        # d(out) lag-1: chunk i's top-halo row completes chunk i-1
        @pl.when(i > 0)
        def _finalize_prev():
            dopend[:, pl.ds(n - w, w)] += dlnacc[:, pl.ds(128, w)]
            _v_branch(i - 1, dopend[:].astype(dtype))

        dopend[:] = dlnacc[:, pl.ds(128 + w, n)]
        dopend[:, pl.ds(0, w)] += docarry[:]
        docarry[:] = dlnacc[:, pl.ds(128 + w + n, w)]
        sprev[:] = s_ref[:, pl.ds(w, n)]
        vprev[:] = v_full[:, w:w + n]

    def start_x2(i, xwin, sem):
        _dma_x_window_start(x_hbm, b, xwin, sem, i, nchunks, hc, h, w,
                            dtype, halo=2)

    def wait_x2(i, xwin, sem):
        _dma_x_window_wait(x_hbm, b, xwin, sem, i, nchunks, hc, h, w,
                           halo=2)

    if nchunks % 2 or nchunks < 2:
        def loop1(i, _):
            start_x2(i, xw, sem_in)
            start_dy(i, dych, sem_dy)
            wait_x2(i, xw, sem_in)
            wait_dy(i, dych, sem_dy)
            loop1_core(i, xw, dych)
            return 0

        jax.lax.fori_loop(0, nchunks, loop1, 0)
    else:
        start_x2(0, xw, sem_in)
        start_dy(0, dych, sem_dy)

        def loop1_pair(j, _):
            i0 = 2 * j
            start_x2(i0 + 1, xwb, sem_inb)
            start_dy(i0 + 1, dychb, sem_dyb)
            wait_x2(i0, xw, sem_in)
            wait_dy(i0, dych, sem_dy)
            loop1_core(i0, xw, dych)

            @pl.when(i0 + 2 < nchunks)
            def _pre():
                start_x2(i0 + 2, xw, sem_in)
                start_dy(i0 + 2, dych, sem_dy)

            wait_x2(i0 + 1, xwb, sem_inb)
            wait_dy(i0 + 1, dychb, sem_dyb)
            loop1_core(i0 + 1, xwb, dychb)
            return 0

        jax.lax.fori_loop(0, nchunks // 2, loop1_pair, 0)
    # flush: last chunk's d(out) receives no further halo adds
    _v_branch(nchunks - 1, dopend[:].astype(dtype))
    f32stage[:] = dlpend[:]
    cp_fin = pltpu.make_async_copy(
        f32stage, dlnv_hbm.at[b, :, pl.ds((nchunks - 1) * hc * w, n)],
        sem_ln)
    cp_fin.start()
    cp_fin.wait()

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

    # ---- loop 2: q/k backward + LayerNorm backward -> dx -----------------
    def _ln_bwd_out(j):
        """Finalize chunk j: dLN = rolled q/k partial + the HBM dLN_v
        plane; LayerNorm backward on the carried x chunk + dy residual."""
        base = pl.multiple_of(j * hc * w, 128)
        cp_ln = pltpu.make_async_copy(
            dlnv_hbm.at[b, :, pl.ds(base, n)], f32stage, sem_ln)
        cp_ln.start()
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base, n)], dych, sem_dy)
        cp_dy.start()
        xf = xprev[:].astype(f32)
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        cp_ln.wait()
        dln = dlpend[:] + f32stage[:]
        dscale_ref[:, :] += jnp.sum(dln * xhat, axis=1, keepdims=True)
        dbias_ref[:, :] += jnp.sum(dln, axis=1, keepdims=True)
        ds2 = dln * scale
        dxln = rstd * (ds2 - jnp.mean(ds2, axis=0, keepdims=True)
                       - xhat * jnp.mean(ds2 * xhat, axis=0, keepdims=True))
        cp_dy.wait()
        stage[:] = dych[:] + dxln.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, dx_hbm.at[b, :, pl.ds(base, n)], sem_out)
        cp_out.start()
        cp_out.wait()

    dlpend[:] = jnp.zeros(dlpend.shape, f32)
    dlcarry[:] = jnp.zeros(dlcarry.shape, f32)

    h2 = 1 if w % 128 == 0 else 2

    def loop2_core(i, xwin):
        r0 = pl.multiple_of(i * hc, hc)
        ln, _, _ = _ln_flat(
            xwin[:, pl.ds(0 if w % 128 == 0 else w, n2)].astype(f32),
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
        dlnacc[:] = jnp.zeros(dlnacc.shape, f32)
        _per_tap_scatter(((kq, dqd), (kk, dkd)), dlnacc, accl,
                         accr, masks_ext, c, w, n)

        @pl.when(i > 0)
        def _finalize_prev():
            dlpend[:, pl.ds(n - w, w)] += dlnacc[:, pl.ds(128, w)]
            _ln_bwd_out(i - 1)

        dlpend[:] = dlnacc[:, pl.ds(128 + w, n)]
        dlpend[:, pl.ds(0, w)] += dlcarry[:]
        dlcarry[:] = dlnacc[:, pl.ds(128 + w + n, w)]
        xprev[:] = xwin[:, pl.ds(w if w % 128 == 0 else 2 * w, n)]

    _pipelined_loop(
        nchunks,
        lambda i, buf, sem: _dma_x_window_start(
            x_hbm, b, buf, sem, i, nchunks, hc, h, w, dtype, halo=h2),
        lambda i, buf, sem: _dma_x_window_wait(
            x_hbm, b, buf, sem, i, nchunks, hc, h, w, halo=h2),
        loop2_core, (xw2, sem_in), (xw2b, sem_inb))
    _ln_bwd_out(nchunks - 1)


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
            pltpu.VMEM((c, n4), x.dtype),
            pltpu.VMEM((c, n4), x.dtype),       # xwb: out-loop pipe slot
            # xw2: halo-1 frame, fetched via a halo-2 aligned DMA
            # window at W=64 (see _dma_x_window alignment note)
            pltpu.VMEM((c, n2 if w % 128 == 0 else n4), x.dtype),
            pltpu.VMEM((c, n2 if w % 128 == 0 else n4), x.dtype),  # xw2b
            pltpu.VMEM((c, n4 + 2 * p), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((9 * c, n2), x.dtype),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),        # stageb: out pipe slot
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
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
            _any_spec(), _any_spec(),
            c1, c1, k9, k9, k9,
            _vmem_full((nhh, 1)), cc, k9, cc,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((bsz, c, h * w), f32),   # dLN_v scratch
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
            pltpu.VMEM((c, n4), x.dtype),       # xwb: loop-1 pipe slot
            # xw2: halo-1 frame, fetched via a halo-2 aligned DMA
            # window at W=64 (see _dma_x_window alignment note)
            pltpu.VMEM((c, n2 if w % 128 == 0 else n4), x.dtype),
            pltpu.VMEM((c, n2 if w % 128 == 0 else n4), x.dtype),  # xw2b
            pltpu.VMEM((c, n4 + 2 * p), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((9 * c, n2), x.dtype),
            pltpu.VMEM((9 * c, n), x.dtype),
            pltpu.VMEM((c, n), f32),
            pltpu.VMEM((c, n2 + 256), f32),
            pltpu.VMEM((c, n2 + 256), f32),
            pltpu.VMEM((c, n + 2 * w), f32),    # accl (aligned scatter)
            pltpu.VMEM((c, n + 2 * w), f32),    # accr (aligned scatter)
            pltpu.VMEM((c, n), f32),
            pltpu.VMEM((c, w), f32),
            pltpu.VMEM((c, n), f32),
            pltpu.VMEM((c, w), f32),
            pltpu.VMEM((c, n), f32),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, c), f32),
            pltpu.VMEM((c, 1), f32),
            pltpu.VMEM((c, 1), f32),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),        # dychb: loop-1 pipe slot
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), dy.reshape(bsz, c, h * w),
      sc, bi, kq, kk, kv, tc, sel, blk, w_po, kvf, w_pof, g, sq, sk)
    (dx, _dlnv, dsc, dbi, dkq, dkk, dkv, dtemp, dwpo, dkvf, dwpof) = outs
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
def _fused_ln_mdta_banded(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
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


_fused_ln_mdta_banded.defvjp(_vjp_fwd, _vjp_bwd)


def fused_ln_mdta_banded(x, scale, bias, w_qkv, t_qkv, temp, w_po, w_kv,
                         t_kv, w_pof, *, num_heads: int, eps: float = 1e-5,
                         interpret: bool | None = None):
    """``x + MDTA(LayerNorm(x))`` on channels-first ``(B, C, H, W)`` —
    banded variant with no whole-image VMEM residents (see module
    docstring).  Same signature as ``fused_attn.fused_ln_mdta``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3], x.shape[1],
                    jnp.dtype(x.dtype).itemsize):
        raise ValueError(f"fused_ln_mdta_banded: unsupported {x.shape}")
    return _fused_ln_mdta_banded(x, scale, bias, w_qkv, t_qkv, temp,
                                 w_po, w_kv, t_kv, w_pof, int(num_heads),
                                 float(eps), bool(interpret))

"""Banded fused LN+GDFN kernel (Pallas TPU) — composed-matmul variant.

Same math as ``ops.fused_block.fused_ln_gdfn`` (``y = x +
project_out(gelu(t1) * t2)`` with ``[t1; t2] = dwconv3x3(project_in(
LayerNorm_C(x)))`` — reference ``src/Models/SpectralTransformer.py:117-148``)
with two structural changes over the whole-image kernel:

1. **Banding** (ported from ``ops.fused_leff``): forward AND backward
   stream x in (hc+2)-row halo windows (``_dma_x_window``); the backward
   replaces ``fused_block``'s whole-image dLN accumulator + second pass
   with the ROLLING LAG-1 FINALIZATION — chunk i's dLN contributions
   touch only rows [i·hc−1, (i+1)·hc], so block i−1's dLN is final as
   soon as chunk i lands, carrying only (C, hc·W)-sized state.  No
   whole-image VMEM residents → the reference train resolution (1024²,
   ``src/DataManipulation/DataLoader.py:13-20``) qualifies at BOTH its
   full-res channel widths (C=16 and C=32).

2. **Composed contraction**: project_in (1×1, bias-free) followed by the
   bias-free depthwise 3×3 is linear∘linear, so both collapse into ONE
   matmul against a 9-shifted stack of the LayerNorm output:

       t[g, q] = Σ_{c,k} K[(k,c), g] · lnshift[(k,c), q],
       K[(k,c), g] = w_in[c, g] · tap[g, k]       (built host-side)

   The MXU contraction dim becomes 9·C (144/288 vs 16/32 — full systolic
   utilization instead of 12.5%), and the 18 VPU shift-MACs per gated
   half become 9 cheap (C, n) copies shared by both halves.  The weight
   VJP returns dK and decomposes to (dw_in, dtap) host-side via the
   product rule.

Numerics: identical materialization points to ``fused_block`` EXCEPT that
project_in's output is no longer rounded to the compute dtype before the
depthwise taps (the composed matmul accumulates both stages in f32) — in
f32 compute the paths are equality-pinned (tests/test_fused_gdfn_banded);
in bf16 the composed form is strictly *more* accurate at that point.
LayerNorm stats/affine in f32, gelu via XLA's own erf expansion, zero
padding applied to the dwconv input (= masking LN's image-halo rows, which
commutes with the linear stages).  Reverse-mode AD only, like its
siblings.

Dispatch: ``models.spectral_transformer.SpectralBlock`` routes here when
``fused_block.supports`` rejects the shape but ``supports`` here passes
(or everywhere under ``UIRT_GDFN_BANDED=1``); see ``_fused_gdfn_enabled``
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
    _scatter_taps_aligned,
    _dma_x_window,
    _dma_x_window_start,
    _dma_x_window_wait,
    _gelu_exact,
    _gelu_grad,
    _ln_flat,
    _row_mask,
    _vmem_full,
    _w_ok,
    _zero_guards,
    _TAPS,
)


def pick_hc(h: int, w: int, c: int, hid: int) -> int:
    """Largest row-chunk dividing H whose live chunk set — ~6 f32
    (hid, hc·W) intermediates, the (9C, hc·W) shifted stack (dtype + one
    f32 transient), and the (C, (hc+2)·W) dLN frame — stays within ~6 MB.
    Chunks down to 2 rows are allowed (no whole-image buffers)."""
    from .fused_block import _hc_force

    forced = _hc_force(h, "gdfn")
    if forced is not None:
        return forced
    for hc in (64, 32, 16, 8, 4, 2):
        if h % hc:
            continue
        live = (6 * hid + 9 * c) * hc * w * 4 + 9 * c * hc * w * 2 \
            + 2 * c * (hc + 2) * w * 4 \
            + 2 * c * (hc * w + 2 * w) * 4   # accl/accr scatter frames
        if live <= 6 * 1024 * 1024:
            return hc
    return 2


def pick_hc_fwd(h: int, w: int, c: int, hid: int) -> int:
    """Forward-only row chunk: the forward's live f32 set is ~(3·hid + C)
    (t1/t2, the gelu product, u) instead of the backward's ~6·hid+9C, and
    there is no dLN frame — so the chunk can be ~2x the shared pick_hc
    (C=32: 8 vs 4 → half the serialized DMA round-trips).  Budget counts
    the double-buffered input windows and both output stages of the
    pipelined schedule."""
    from .fused_block import _hc_force

    forced = _hc_force(h, "gdfn")
    if forced is not None:
        return forced
    bh = 1 if (w % 128 == 0) else 2
    for hc in (64, 32, 16, 8, 4, 2):
        if h % hc:
            continue
        n, n2 = hc * w, (hc + 2) * w
        live = (
            2 * c * (hc + 2 * bh) * w * 2       # xw double-buffer
            + c * (n2 + 2 * (w + 128)) * 2      # lnbuf + guards
            + 9 * c * n * 2 * 2                 # stack (+1 dtype transient)
            + (3 * hid + c) * n * 4             # t1/t2/g1*t2 product, u
            + 2 * c * n * 2                     # out stages
        )
        if live <= 6 * 1024 * 1024:
            return hc
    return 2


def supports(h: int, w: int, c: int | None = None, hid: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate.  No whole-image term: guards + live chunk set at the
    chosen chunk size."""
    if not _w_ok(w) or h % 8:
        return False
    if c is None or hid is None:
        return True
    if c % 8:
        return False
    from .fused_block import _hc_force

    if _hc_force(h, "gdfn") is not None:
        return True  # A/B override: let Mosaic's own VMEM check decide
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    guards = c * (n2 + 2 * p) * itemsize + 9 * c * n * itemsize \
        + c * (n2 + 256) * 4
    live = (6 * hid + 9 * c) * n * 4 + 2 * c * n2 * 4 \
        + 2 * c * (n + 2 * w) * 4            # accl/accr scatter frames
    carry = 4 * c * n * 4
    # input-pipelining double buffers (xw1 + dy0/dy1, see _bwd_kernel)
    pipe = c * (hc + 4) * w * itemsize + 2 * c * n * itemsize
    return guards + live + carry + pipe <= 12 * 1024 * 1024


def _build_k(w_half, taps_half):
    """K[(k,c), g] = w_half[c, g] * taps_half[g, k] -> (9c, hid)."""
    # taps_half: (hid, 9); w_half: (c, hid)
    return (taps_half.T[:, None, :] * w_half[None, :, :]).reshape(
        9 * w_half.shape[0], w_half.shape[1])


def _decompose_dk(dk, w_half, taps_half):
    """Product-rule split of dK -> (dw_half (c, hid), dtaps_half (hid, 9))."""
    c = w_half.shape[0]
    dk3 = dk.reshape(9, c, dk.shape[1])
    dw = jnp.einsum("kcg,gk->cg", dk3, taps_half,
                    preferred_element_type=jnp.float32)
    dtap = jnp.einsum("kcg,cg->gk", dk3, w_half,
                      preferred_element_type=jnp.float32)
    return dw, dtap


def _build_shift_stack(s_ref, lnbuf, masks, c: int, p: int, w: int, n: int,
                       dtype):
    """S[(k,c), q] = lnshift_k[c, q] — 9 statically-offset (C, n) slices of
    the guard-padded LN buffer, column-wrapping shifts masked to zero
    (zero-pad semantics).  Shared by both gated halves.  ``masks`` must be
    ``_col_masks(w, n, dtype)`` — a 0/1 multiply is exact in the compute
    dtype, skipping the f32 cast round-trip per element."""
    del dtype
    from .fused_block import _kabl

    if _kabl("nostack"):  # timing-only: matmuls consume stale scratch
        return
    for k, (dh, dw) in enumerate(_TAPS):
        sl = lnbuf[:, pl.ds(p + dh * w + dw - 1, n)]
        if masks[dw] is not None:
            sl = sl * masks[dw]
        s_ref[k * c:(k + 1) * c, :] = sl


def _fwd_kernel(x_hbm, scale_ref, bias_ref, ka_ref, kb_ref, wout_ref,
                out_hbm, xw0, xw1, lnbuf, s_ref, stage0, stage1,
                sem_in0, sem_in1, sem_out0, sem_out1, *,
                hc: int, h: int, w: int, eps: float, dtype):
    """Lag-1 pipelined forward: chunk i+1's halo window streams in while
    chunk i computes, and the output DMA is only waited on before its
    stage buffer is reused two chunks later.  Slots are unrolled
    statically (chunks 2j / 2j+1 -> buffers 0 / 1) so no dynamic scratch
    indexing is needed; nchunks is even for every supported shape
    (H, hc both powers of two), with a serial fallback otherwise."""
    c = scale_ref.shape[0]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)
    # HBM DMA slices must be 128-aligned in offset AND length; halo-1
    # windows at W=64 are odd multiples of 64, so fetch a halo-2 window
    # (always aligned for even hc) and address the halo-1 frame at the
    # static in-buffer origin q0 (static VMEM offsets need no alignment)
    bh = 1 if (w % 128 == 0) else 2
    q0 = (bh - 1) * w

    _zero_guards(lnbuf, p, n2, dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    ka = ka_ref[:].astype(dtype)
    kb = kb_ref[:].astype(dtype)
    wout = wout_ref[:].astype(dtype)
    masks = _col_masks(w, n, dtype)

    def compute(i, xw, stage, sem_out):
        """LN -> stack -> matmuls on an already-landed window; starts the
        output DMA without waiting."""
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        ln, _, _ = _ln_flat(xw[:, pl.ds(q0, n2)].astype(f32), scale, bias,
                            eps)
        rmask = _row_mask(r0, hc, h, w, n2)
        lnbuf[:, pl.ds(p, n2)] = jnp.where(rmask, ln, 0.0).astype(dtype)
        _build_shift_stack(s_ref, lnbuf, masks, c, p, w, n, dtype)
        s = s_ref[:]
        t1 = jax.lax.dot_general(ka, s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        t2 = jax.lax.dot_general(kb, s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        o = (_gelu_exact(t1) * t2).astype(dtype)
        u = jax.lax.dot_general(wout, o, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        stage[:] = xw[:, pl.ds(q0 + w, n)] + u.astype(dtype)
        pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(base, n)], sem_out).start()

    def wait_out(i, stage, sem_out):
        base = pl.multiple_of(i * hc * w, 128)
        pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(base, n)], sem_out).wait()

    def start_in(i, xw, sem):
        _dma_x_window_start(x_hbm, b, xw, sem, i, nchunks, hc, h, w,
                            dtype, halo=bh)

    def wait_in(i, xw, sem):
        _dma_x_window_wait(x_hbm, b, xw, sem, i, nchunks, hc, h, w,
                           halo=bh)

    if nchunks % 2 or nchunks < 2:
        def chunk(i, _):
            start_in(i, xw0, sem_in0)
            wait_in(i, xw0, sem_in0)
            compute(i, xw0, stage0, sem_out0)
            wait_out(i, stage0, sem_out0)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk, 0)
        return

    start_in(0, xw0, sem_in0)

    def pair(j, _):
        i0 = 2 * j
        start_in(i0 + 1, xw1, sem_in1)
        wait_in(i0, xw0, sem_in0)

        @pl.when(j > 0)
        def _drain0():
            wait_out(i0 - 2, stage0, sem_out0)

        compute(i0, xw0, stage0, sem_out0)

        @pl.when(i0 + 2 < nchunks)
        def _pre0():
            start_in(i0 + 2, xw0, sem_in0)

        wait_in(i0 + 1, xw1, sem_in1)

        @pl.when(j > 0)
        def _drain1():
            wait_out(i0 - 1, stage1, sem_out1)

        compute(i0 + 1, xw1, stage1, sem_out1)
        return 0

    jax.lax.fori_loop(0, nchunks // 2, pair, 0)
    wait_out(nchunks - 2, stage0, sem_out0)
    wait_out(nchunks - 1, stage1, sem_out1)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, ka_ref, kb_ref,
                wout_ref,
                dx_hbm, dscale_ref, dbias_ref, dka_ref, dkb_ref, dwout_ref,
                xw0, xw1, dy0, dy1, lnbuf, s_ref, dlnacc, accl, accr,
                dpend, dcarry,
                xprev, dyprev, stage, sem_in0, sem_in1, sem_dy0, sem_dy1,
                sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype):
    """Input side lag-1 pipelined: chunk i+1's x halo window AND dy block
    stream in while chunk i computes (the dx output wait stays inline —
    it lands right after the heavy per-chunk compute).  The lag-1 dLN
    finalization carries (dpend/dcarry/xprev/dyprev) are untouched:
    compute order is identical to the serial loop."""
    c = scale_ref.shape[0]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dka_ref, dkb_ref, dwout_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    _zero_guards(lnbuf, p, n2, dtype)
    dpend[:] = jnp.zeros(dpend.shape, dpend.dtype)
    dcarry[:] = jnp.zeros(dcarry.shape, dcarry.dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    ka = ka_ref[:].astype(dtype)
    kb = kb_ref[:].astype(dtype)
    wout = wout_ref[:].astype(dtype)
    masks_ext = _col_masks(w, n + 2 * w)  # f32: scatter frame masks
    masks_d = _col_masks(w, n, dtype)     # compute-dtype: stack builds

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
        return dy_res + dxln.astype(dtype)

    bh = 1 if (w % 128 == 0) else 2  # aligned-DMA halo (see _fwd_kernel)
    q0 = (bh - 1) * w

    def start_dy(i, dyb, sem):
        base = pl.multiple_of(i * hc * w, 128)
        pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base, n)], dyb, sem).start()

    def wait_dy(i, dyb, sem):
        base = pl.multiple_of(i * hc * w, 128)
        pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base, n)], dyb, sem).wait()

    def chunk_core(i, xw, dyb):
        r0 = pl.multiple_of(i * hc, hc)
        ln, _, _ = _ln_flat(xw[:, pl.ds(q0, n2)].astype(f32), scale, bias,
                            eps)
        rmask = _row_mask(r0, hc, h, w, n2)
        lnbuf[:, pl.ds(p, n2)] = jnp.where(rmask, ln, 0.0).astype(dtype)
        _build_shift_stack(s_ref, lnbuf, masks_d, c, p, w, n, dtype)
        s = s_ref[:]
        t1 = jax.lax.dot_general(ka, s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        t2 = jax.lax.dot_general(kb, s, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        g1 = _gelu_exact(t1)
        dyd = dyb[:]
        du = dyd
        do = jax.lax.dot_general(wout, du, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)       # (hid, n)
        o = (g1 * t2).astype(dtype)
        dwout_ref[:, :] += jax.lax.dot_general(
            o, du, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dta = (do * t2 * _gelu_grad(t1)).astype(dtype)
        dtb = (do * g1).astype(dtype)
        dka_ref[:, :] += jax.lax.dot_general(
            s, dta, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dkb_ref[:, :] += jax.lax.dot_general(
            s, dtb, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        ds = (jax.lax.dot_general(ka, dta, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
              + jax.lax.dot_general(kb, dtb, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32))  # (9c, n)
        # transposed shifts: scatter each k block into the dLN frame
        # (rows r0-1 .. r0+hc] live at [128, 128+n2) of dlnacc) via the
        # lane-aligned per-direction form (fused_block._scatter_taps_aligned)
        dlnacc[:] = jnp.zeros(dlnacc.shape, f32)
        _scatter_taps_aligned(lambda k: ds[k * c:(k + 1) * c, :],
                              dlnacc, accl, accr, masks_ext, c, w, n)
        dlnc = dlnacc[:, pl.ds(128, n2)]

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
        xprev[:] = xw[:, pl.ds(q0 + w, n)]
        dyprev[:] = dyd

    def start_in(i, xw, sem):
        _dma_x_window_start(x_hbm, b, xw, sem, i, nchunks, hc, h, w,
                            dtype, halo=bh)

    def wait_in(i, xw, sem):
        _dma_x_window_wait(x_hbm, b, xw, sem, i, nchunks, hc, h, w,
                           halo=bh)

    if nchunks % 2 or nchunks < 2:
        def chunk(i, _):
            start_in(i, xw0, sem_in0)
            start_dy(i, dy0, sem_dy0)
            wait_in(i, xw0, sem_in0)
            wait_dy(i, dy0, sem_dy0)
            chunk_core(i, xw0, dy0)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk, 0)
    else:
        start_in(0, xw0, sem_in0)
        start_dy(0, dy0, sem_dy0)

        def pair(j, _):
            i0 = 2 * j
            start_in(i0 + 1, xw1, sem_in1)
            start_dy(i0 + 1, dy1, sem_dy1)
            wait_in(i0, xw0, sem_in0)
            wait_dy(i0, dy0, sem_dy0)
            chunk_core(i0, xw0, dy0)

            @pl.when(i0 + 2 < nchunks)
            def _pre():
                start_in(i0 + 2, xw0, sem_in0)
                start_dy(i0 + 2, dy0, sem_dy0)

            wait_in(i0 + 1, xw1, sem_in1)
            wait_dy(i0 + 1, dy1, sem_dy1)
            chunk_core(i0 + 1, xw1, dy1)
            return 0

        jax.lax.fori_loop(0, nchunks // 2, pair, 0)

    # last block: no further halo contributions
    dxb = _ln_bwd_out(xprev[:].astype(jnp.float32), dpend[:], dyprev[:])
    stage[:] = dxb
    cp_out = pltpu.make_async_copy(
        stage, dx_hbm.at[b, :, pl.ds((h - hc) * w, hc * w)], sem_out)
    cp_out.start()
    cp_out.wait()


def _split_k(scale, bias, w_in, w_dw, w_out):
    """Host-side composition into the kernel's operands."""
    c, g2 = w_in.shape
    hid = g2 // 2
    taps = w_dw.reshape(9, g2).T  # (2h, 9), k = dh*3+dw
    ka = _build_k(w_in[:, :hid], taps[:hid])
    kb = _build_k(w_in[:, hid:], taps[hid:])
    return scale.reshape(c, 1), bias.reshape(c, 1), ka, kb, w_out


def _fwd_call(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc_fwd(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    bh = 1 if (w % 128 == 0) else 2  # aligned-DMA halo (see _fwd_kernel)
    p = w + 128
    kern = functools.partial(_fwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((9 * c, hid)), _vmem_full((9 * c, hid)),
            _vmem_full((hid, c)),
        ],
        out_specs=_any_spec(),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, (hc + 2 * bh) * w), x.dtype),
            pltpu.VMEM((c, (hc + 2 * bh) * w), x.dtype),
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),
            pltpu.VMEM((9 * c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), *_split_k(scale, bias, w_in, w_dw, w_out))
    return out.reshape(bsz, c, h, w)


def _bwd_call(x, dy, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    bh = 1 if (w % 128 == 0) else 2  # aligned-DMA halo (see _fwd_kernel)
    p = w + 128
    f32 = jnp.float32
    kern = functools.partial(_bwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    outs = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(), _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((9 * c, hid)), _vmem_full((9 * c, hid)),
            _vmem_full((hid, c)),
        ],
        out_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((9 * c, hid)), _vmem_full((9 * c, hid)),
            _vmem_full((hid, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((9 * c, hid), f32),
            jax.ShapeDtypeStruct((9 * c, hid), f32),
            jax.ShapeDtypeStruct((hid, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, (hc + 2 * bh) * w), x.dtype),   # xw0
            pltpu.VMEM((c, (hc + 2 * bh) * w), x.dtype),   # xw1 (pipe)
            pltpu.VMEM((c, n), x.dtype),                   # dy0
            pltpu.VMEM((c, n), x.dtype),                   # dy1 (pipe)
            pltpu.VMEM((c, n2 + 2 * p), x.dtype),          # lnbuf
            pltpu.VMEM((9 * c, n), x.dtype),               # s_ref
            pltpu.VMEM((c, n2 + 256), f32),                # dlnacc
            pltpu.VMEM((c, n + 2 * w), f32),               # accl (scatter)
            pltpu.VMEM((c, n + 2 * w), f32),               # accr (scatter)
            pltpu.VMEM((c, n), f32),                       # dpend
            pltpu.VMEM((c, n), f32),                       # dcarry
            pltpu.VMEM((c, n), x.dtype),                   # xprev
            pltpu.VMEM((c, n), x.dtype),                   # dyprev
            pltpu.VMEM((c, n), x.dtype),                   # stage (dx out)
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), dy.reshape(bsz, c, h * w),
      *_split_k(scale, bias, w_in, w_dw, w_out))
    dx, dsc, dbi, dka, dkb, dwo = outs
    taps = w_dw.reshape(9, g2).T
    dwia, dtapa = _decompose_dk(dka, w_in[:, :hid], taps[:hid])
    dwib, dtapb = _decompose_dk(dkb, w_in[:, hid:], taps[hid:])
    dwin = jnp.concatenate([dwia, dwib], axis=1)
    dwdw = jnp.concatenate([dtapa, dtapb], axis=0).T.reshape(3, 3, g2)
    return (dx.reshape(x.shape), dsc.reshape(c), dbi.reshape(c),
            dwin, dwdw, dwo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_ln_gdfn_banded(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
    return _fwd_call(x, scale, bias, w_in, w_dw, w_out, eps, interpret)


def _vjp_fwd(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
    out = _fwd_call(x, scale, bias, w_in, w_dw, w_out, eps, interpret)
    return out, (x, scale, bias, w_in, w_dw, w_out)


def _vjp_bwd(eps, interpret, res, dy):
    x, scale, bias, w_in, w_dw, w_out = res
    dx, dsc, dbi, dwi, dwd, dwo = _bwd_call(
        x, dy, scale, bias, w_in, w_dw, w_out, eps, interpret)
    return (dx, dsc.astype(scale.dtype), dbi.astype(bias.dtype),
            dwi.astype(w_in.dtype), dwd.astype(w_dw.dtype),
            dwo.astype(w_out.dtype))


_fused_ln_gdfn_banded.defvjp(_vjp_fwd, _vjp_bwd)


def fused_ln_gdfn_banded(x, scale, bias, w_in, w_dw, w_out, *,
                         eps: float = 1e-5, interpret: bool | None = None):
    """``x + GDFN(LayerNorm(x))`` on channels-first ``(B, C, H, W)`` —
    banded + composed-matmul variant (see module docstring).  Same
    signature and f32 numerics as ``fused_block.fused_ln_gdfn``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3], x.shape[1],
                    w_in.shape[1] // 2):
        raise ValueError(f"fused_ln_gdfn_banded: unsupported {x.shape}")
    return _fused_ln_gdfn_banded(x, scale, bias, w_in, w_dw, w_out,
                                 float(eps), bool(interpret))

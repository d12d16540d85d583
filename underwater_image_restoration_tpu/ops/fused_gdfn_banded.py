"""Banded fused LN+GDFN kernel (Pallas TPU) — the 1024² variant.

Same math as ``ops.fused_block.fused_ln_gdfn`` (``y = x +
project_out(gelu(t1) * t2)`` with ``[t1; t2] = dwconv3x3(project_in(
LayerNorm_C(x)))`` — reference ``src/Models/SpectralTransformer.py:117-148``)
but with NO whole-image VMEM residents: ``fused_block``'s forward keeps the
full (C, (H+2)·W) image in VMEM and its backward additionally carries a
whole-image dLN accumulator, which caps it at ~256² (its own ``supports``
docstring names this).  This kernel ports ``ops.fused_leff``'s banding to
the GDFN dataflow:

- forward AND backward stream x in (hc+2)-row halo windows
  (``_dma_x_window``);
- the backward replaces the dLN accumulator + second pass with the ROLLING
  LAG-1 FINALIZATION: chunk i's dLN contributions (through the transposed
  3x3 depthwise) touch only rows [i·hc−1, (i+1)·hc], so block i−1's dLN is
  final as soon as chunk i lands, and its LayerNorm backward + dx DMA-out
  happen immediately, carrying only (C, hc·W)-sized state.

That banding is what qualifies the reference train resolution (1024²,
``src/DataManipulation/DataLoader.py:13-20``) where the whole-image kernel
cannot fit (C=16 @ 1024²: the x copy alone is 33.6 MB > 16 MB VMEM).

Numerics are bit-identical to ``fused_block`` (same materialization
points, same ``_erf_f32`` gelu, same mask/guard machinery — all imported
from there).  Reverse-mode AD only, like its siblings.

Dispatch: ``models.spectral_transformer.SpectralBlock`` routes here when
``fused_block.supports`` rejects the shape but ``supports`` here passes
(or unconditionally under ``UIRT_GDFN_BANDED=1`` for A/B); see
``_fused_gdfn_enabled`` there.
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
    _split_weights,
    _vmem_full,
    _zero_guards,
    _TAPS,
)


def pick_hc(h: int, w: int, c: int, hid: int) -> int:
    """Largest row-chunk dividing H whose ~6 live f32 (hid, (hc+2)·W)
    chunk intermediates (two gated branches) stay within ~5 MB.  Chunks
    down to 2 rows are allowed — banded kernels have no whole-image
    buffers, so narrow chunks are what let W=1024 shapes in."""
    for hc in (64, 32, 16, 8, 4, 2):
        if h % hc:
            continue
        if hid * (hc + 2) * w * 4 * 6 <= 5 * 1024 * 1024:
            return hc
    return 2


def supports(h: int, w: int, c: int | None = None, hid: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate.  No whole-image term: the budget is the four guard
    buffers plus the live f32 chunk intermediates at the chosen chunk."""
    if w % 128 or h % 8:
        return False
    if c is None or hid is None:
        return True
    if c % 8:
        return False
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    guards = 2 * hid * (n2 + 2 * p) * itemsize + \
        2 * hid * (n + 2 * (p + w)) * itemsize
    # live f32: y1/dy1 frames are (hid, n2) but transient one-at-a-time
    # (2 slots); t1/t2/g1/do/dta/dtb are (hid, n); dlnc is (c, n2)
    live = (2 * hid * n2 + 6 * hid * n + 2 * c * n2) * 4
    carry = 4 * c * n * 4
    return guards + live + carry <= 12 * 1024 * 1024


def _fwd_kernel(x_hbm, scale_ref, bias_ref, wina_ref, winb_ref, tapa_ref,
                tapb_ref, wout_ref, out_hbm,
                xw, bufa, bufb, stage, sem_in, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype):
    c = scale_ref.shape[0]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    _zero_guards(bufa, p, n2, dtype)
    _zero_guards(bufb, p, n2, dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    wina = wina_ref[:].astype(dtype)
    winb = winb_ref[:].astype(dtype)
    wout = wout_ref[:].astype(dtype)
    masks = _col_masks(w, n)

    def chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        _dma_x_window(x_hbm, b, xw, sem_in, i, nchunks, hc, h, w, dtype)
        ln, _, _ = _ln_flat(xw[:].astype(f32), scale, bias, eps)
        ln = ln.astype(dtype)
        rmask = _row_mask(r0, hc, h, w, n2)
        for win, buf in ((wina, bufa), (winb, bufb)):
            y1 = jax.lax.dot_general(win, ln, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            buf[:, pl.ds(p, n2)] = jnp.where(rmask, y1, 0.0).astype(dtype)
        t1 = _dw_shift_acc(bufa, tapa_ref, masks, p, w, n, dtype)
        t2 = _dw_shift_acc(bufb, tapb_ref, masks, p, w, n, dtype)
        o = (_gelu_exact(t1) * t2).astype(dtype)
        u = jax.lax.dot_general(wout, o, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        stage[:] = xw[:, pl.ds(w, n)] + u.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(base, n)], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, wina_ref, winb_ref,
                tapa_ref, tapb_ref, wout_ref,
                dx_hbm, dscale_ref, dbias_ref, dwina_ref, dwinb_ref,
                dtapa_ref, dtapb_ref, dwout_ref,
                xw, bufa, bufb, dtbufa, dtbufb, dpend, dcarry, xprev,
                dyprev, stage, sem_in, sem_dy, sem_out, *,
                hc: int, h: int, w: int, eps: float, dtype):
    c = scale_ref.shape[0]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    f32 = jnp.float32
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dwina_ref, dwinb_ref,
                    dtapa_ref, dtapb_ref, dwout_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    _zero_guards(bufa, p, n2, dtype)
    _zero_guards(bufb, p, n2, dtype)
    _zero_guards(dtbufa, p + w, n, dtype)
    _zero_guards(dtbufb, p + w, n, dtype)
    dpend[:] = jnp.zeros(dpend.shape, dpend.dtype)
    dcarry[:] = jnp.zeros(dcarry.shape, dcarry.dtype)
    scale = scale_ref[:].astype(f32)
    bias = bias_ref[:].astype(f32)
    wina = wina_ref[:].astype(dtype)
    winb = winb_ref[:].astype(dtype)
    wout = wout_ref[:].astype(dtype)
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
        for win, buf in ((wina, bufa), (winb, bufb)):
            y1 = jax.lax.dot_general(win, ln, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            buf[:, pl.ds(p, n2)] = jnp.where(rmask, y1, 0.0).astype(dtype)
        t1 = _dw_shift_acc(bufa, tapa_ref, masks, p, w, n, dtype)
        t2 = _dw_shift_acc(bufb, tapb_ref, masks, p, w, n, dtype)
        g1 = _gelu_exact(t1)
        cp_dy.wait()
        dyd = stage[:]
        du = dyd
        do = jax.lax.dot_general(wout, du, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)       # (hid, n)
        o = (g1 * t2).astype(dtype)
        dwout_ref[:, :] += jax.lax.dot_general(
            o, du, (((1,), (1,)), ((), ())), preferred_element_type=f32)
        dta = do * t2 * _gelu_grad(t1)
        dtb = do * g1
        # dt rounds to the compute dtype here, as fused_block's does
        dtbufa[:, pl.ds(p + w, n)] = dta.astype(dtype)
        dtbufb[:, pl.ds(p + w, n)] = dtb.astype(dtype)
        for buf, dt, dtap in ((bufa, dta, dtapa_ref), (bufb, dtb, dtapb_ref)):
            for k_, (dh, dw) in enumerate(_TAPS):
                s_ = p + dh * w + dw - 1
                term = buf[:, pl.ds(s_, n)].astype(f32) * dt
                if masks[dw] is not None:
                    term = term * masks[dw]
                dtap[:, k_:k_ + 1] += jnp.sum(term, axis=1, keepdims=True)
        dlnc = None
        for win, taps, dtbuf, dwin in (
                (wina, tapa_ref, dtbufa, dwina_ref),
                (winb, tapb_ref, dtbufb, dwinb_ref)):
            dy1 = _dw_shift_transpose(dtbuf, taps, tmasks2, p, w, n2)
            dy1 = jnp.where(rmask, dy1, 0.0).astype(dtype)
            dwin[:, :] += jax.lax.dot_general(
                ln, dy1, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                        # (c, hid)
            d = jax.lax.dot_general(win, dy1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)    # (c, n2)
            dlnc = d if dlnc is None else dlnc + d

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
    dxb = _ln_bwd_out(xprev[:].astype(jnp.float32), dpend[:], dyprev[:])
    stage[:] = dxb
    cp_out = pltpu.make_async_copy(
        stage, dx_hbm.at[b, :, pl.ds((h - hc) * w, hc * w)], sem_out)
    cp_out.start()
    cp_out.wait()


def _fwd_call(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    kern = functools.partial(_fwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((c, hid)), _vmem_full((c, hid)),
            _vmem_full((hid, 9)), _vmem_full((hid, 9)),
            _vmem_full((hid, c)),
        ],
        out_specs=_any_spec(),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, n2), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((c, n), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x.reshape(bsz, c, h * w), *_split_weights(scale, bias, w_in, w_dw,
                                                w_out))
    return out.reshape(bsz, c, h, w)


def _bwd_call(x, dy, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc(h, w, c, hid)
    n, n2 = hc * w, (hc + 2) * w
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
            _vmem_full((c, hid)), _vmem_full((c, hid)),
            _vmem_full((hid, 9)), _vmem_full((hid, 9)),
            _vmem_full((hid, c)),
        ],
        out_specs=[
            _any_spec(),
            _vmem_full((c, 1)), _vmem_full((c, 1)),
            _vmem_full((c, hid)), _vmem_full((c, hid)),
            _vmem_full((hid, 9)), _vmem_full((hid, 9)),
            _vmem_full((hid, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, h * w), x.dtype),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, hid), f32),
            jax.ShapeDtypeStruct((c, hid), f32),
            jax.ShapeDtypeStruct((hid, 9), f32),
            jax.ShapeDtypeStruct((hid, 9), f32),
            jax.ShapeDtypeStruct((hid, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, n2), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((hid, n + 2 * (p + w)), x.dtype),
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
      *_split_weights(scale, bias, w_in, w_dw, w_out))
    dx, dsc, dbi, dwia, dwib, dta, dtb, dwo = outs
    dwin = jnp.concatenate([dwia, dwib], axis=1)
    dwdw = jnp.concatenate([dta, dtb], axis=0).T.reshape(3, 3, g2)
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
    banded-streaming variant (see module docstring).  Same signature and
    numerics as ``fused_block.fused_ln_gdfn``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3], x.shape[1],
                    w_in.shape[1] // 2):
        raise ValueError(f"fused_ln_gdfn_banded: unsupported {x.shape}")
    return _fused_ln_gdfn_banded(x, scale, bias, w_in, w_dw, w_out,
                                 float(eps), bool(interpret))

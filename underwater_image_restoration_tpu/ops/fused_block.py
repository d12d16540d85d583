"""Fused channels-first LN+GDFN block kernel (Pallas TPU).

Computes ``y = x + project_out(gelu(t1) * t2)`` where
``[t1; t2] = dwconv3x3(project_in(LayerNorm_C(x)))`` — the second half of a
SpectralBlock (reference ``src/Models/SpectralTransformer.py:117-148``) — in
ONE kernel pass per image, on the channels-first ``(B, C, H, W)`` layout.

Why: the honest round-3 attribution (PERF_NOTES.md) pins the 8 full-res
SpectralBlocks at ~77% of the HBM-streaming-bound train step, with GDFN ~30%.
The XLA path materializes every intermediate in HBM — LN out, project_in out
(2h = 2*2.66*C channels), dwconv out, the gated product, project_out out —
~15x the minimal traffic.  This kernel streams x in and y out once; all
intermediates live in VMEM:

- grid = (B,): each program handles one image, row-chunked so the
  2h-channel intermediates fit VMEM; the 3x3 depthwise needs a 1-row halo,
  provided by a zero-padded whole-image VMEM copy of x (C<=32 at the
  full-res levels, so x is only 2-4 MB).
- x / y stay in HBM (``memory_space=ANY``) and are moved with explicit
  async copies — BlockSpec pipelining would double-buffer whole images.
- matmuls (1x1 convs) run on the MXU with f32 accumulation; the depthwise
  conv is 9 shifted VPU multiply-adds (no MXU-usable contraction);
  LayerNorm statistics are f32 (torch semantics, matching ops.LayerNorm).
- boundary semantics match the XLA path exactly: the zero padding applies
  to the dwconv INPUT (project_in output), so halo rows/cols of ``t`` are
  masked to zero rather than computed from zero-padded x.

The backward (custom VJP) is a second Pallas kernel that recomputes the
forward chain from x in VMEM (FlashAttention-style residual policy: only x
and the weights are saved), so training stores no intermediates either.
Weight gradients accumulate in f32 across the sequential TPU grid.
Restriction: no forward-mode AD (jax.jvp) through this op — reverse-mode
only, like ``ops.layers._depthwise_conv_hybrid``.

Dispatch is routed from ``models.spectral_transformer.SpectralBlock`` when
the channels-first layout is active (see ``_fused_gdfn_enabled`` there).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# XLA's f32 erf rational approximation (xla/client/lib/math.cc ErfImpl32:
# x * P(x^2)/Q(x^2) on clamp(x, -4, 4); max error ~1 ulp f32).  Mosaic has
# no erf primitive, so the kernel evaluates the same expansion XLA itself
# lowers erf to — the fused path tracks the unfused one to f32 rounding.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for a in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(a)
    q = jnp.float32(_ERF_BETA[0])
    for b in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(b)
    return jnp.clip(x * p / q, -1.0, 1.0)


def _gelu_exact(x):
    """erf GELU in f32 (torch nn.GELU default; see ops.layers.gelu)."""
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


def _gelu_grad(x):
    """d/dx [x * Phi(x)] = Phi(x) + x * phi(x), f32."""
    phi = jnp.exp(-0.5 * x * x) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + _erf_f32(x * (2.0 ** -0.5)))
    return cdf + x * phi


def pick_hc(h: int, w: int, c: int, g: int) -> int:
    """Largest row-chunk (mult of 8, divides H) whose f32 2h-channel chunk
    intermediates stay within a ~6 MB working-set budget (the whole-image x
    copy, the bf16 dln scratch and Mosaic's transient copies share the
    16 MB VMEM)."""
    for hc in (64, 32, 16, 8):
        if h % hc:
            continue
        if g * (hc + 2) * w * 4 * 3 <= 6 * 1024 * 1024:
            return hc
    return 8


def _row_mask(r0, hc2: int, h: int):
    """(1, hc2, 1) validity mask for global rows [r0-1, r0-1+hc2)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, hc2, 1), 1) + (r0 - 1)
    return (rows >= 0) & (rows < h)


def _ln_chunk(xf, scale, bias, eps):
    """LayerNorm over axis 0 (channels) of an f32 (C, rows, W) chunk.
    Returns (ln, xhat, rstd) — ln in f32 (caller casts)."""
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    return xhat * scale[:, None, None] + bias[:, None, None], xhat, rstd


def _fwd_kernel(x_hbm, scale_ref, bias_ref, win_ref, wdw_ref, wout_ref,
                out_hbm, xp, stage, sem_in, sem_out, *,
                hc: int, eps: float, dtype):
    c, h2, w = xp.shape
    h = h2 - 2
    g2 = win_ref.shape[1]
    hid = g2 // 2
    b = pl.program_id(0)

    cp_in = pltpu.make_async_copy(x_hbm.at[b], xp.at[:, pl.ds(1, h), :],
                                  sem_in)
    cp_in.start()
    # zero the halo rows: their LN output is discarded (masked out of the
    # dwconv input), but it must stay finite — scratch garbage could be NaN
    zrow = jnp.zeros((c, 1, w), dtype)
    xp[:, 0:1, :] = zrow
    xp[:, h + 1:h + 2, :] = zrow
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    win = win_ref[:].astype(dtype)          # (C, 2h)
    wdw = wdw_ref[:].astype(jnp.float32)    # (3, 3, 2h)
    wout = wout_ref[:].astype(dtype)        # (h, C)
    cp_in.wait()

    def chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        # x rows [r0-1, r0+hc+1) == padded rows [r0, r0+hc+2)
        xh = xp[:, pl.ds(r0, hc + 2), :].astype(jnp.float32)
        ln, _, _ = _ln_chunk(xh, scale, bias, eps)
        ln = ln.astype(dtype)
        y1 = jax.lax.dot_general(
            win, ln.reshape(c, (hc + 2) * w),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(g2, hc + 2, w)
        # zero the dwconv-input halo rows that fall outside the image
        # (the XLA path zero-pads project_in's OUTPUT, not x)
        y1 = jnp.where(_row_mask(r0, hc + 2, h), y1, 0.0).astype(dtype)
        y1p = jnp.pad(y1, ((0, 0), (0, 0), (1, 1)))
        acc = None
        for dh in range(3):
            for dw in range(3):
                tap = wdw[dh, dw].astype(dtype)[:, None, None]
                term = (y1p[:, dh:dh + hc, dw:dw + w] * tap).astype(
                    jnp.float32)
                acc = term if acc is None else acc + term
        t1, t2 = acc[:hid], acc[hid:]
        o = (_gelu_exact(t1) * t2).astype(dtype)
        u = jax.lax.dot_general(
            wout, o.reshape(hid, hc * w),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(c, hc, w)
        stage[:] = xp[:, pl.ds(r0 + 1, hc), :] + u.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(r0, hc), :], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, h // hc, chunk, 0)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, win_ref, wdw_ref,
                wout_ref, dx_hbm, dscale_ref, dbias_ref, dwin_ref, dwdw_ref,
                dwout_ref, xp, dlns, dych, stage, sem_in, sem_dy, sem_out, *,
                hc: int, eps: float, dtype):
    c, h2, w = xp.shape
    h = h2 - 2
    g2 = win_ref.shape[1]
    hid = g2 // 2
    b = pl.program_id(0)

    cp_in = pltpu.make_async_copy(x_hbm.at[b], xp.at[:, pl.ds(1, h), :],
                                  sem_in)
    cp_in.start()

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dwin_ref, dwdw_ref, dwout_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    zrow = jnp.zeros((c, 1, w), dtype)
    xp[:, 0:1, :] = zrow
    xp[:, h + 1:h + 2, :] = zrow
    dlns[:] = jnp.zeros(dlns.shape, dlns.dtype)
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    win = win_ref[:].astype(dtype)
    winf = win_ref[:].astype(jnp.float32)
    wdw = wdw_ref[:].astype(jnp.float32)
    wout = wout_ref[:].astype(jnp.float32)
    cp_in.wait()

    def pass1(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(r0, hc), :], dych, sem_dy)
        cp_dy.start()
        xh = xp[:, pl.ds(r0, hc + 2), :].astype(jnp.float32)
        ln, _, _ = _ln_chunk(xh, scale, bias, eps)
        ln = ln.astype(dtype)
        y1 = jax.lax.dot_general(
            win, ln.reshape(c, (hc + 2) * w),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(g2, hc + 2, w)
        mask = _row_mask(r0, hc + 2, h)
        y1 = jnp.where(mask, y1, 0.0).astype(dtype)
        y1p = jnp.pad(y1, ((0, 0), (0, 0), (1, 1)))
        acc = None
        for dh in range(3):
            for dw in range(3):
                tap = wdw[dh, dw].astype(dtype)[:, None, None]
                term = (y1p[:, dh:dh + hc, dw:dw + w] * tap).astype(
                    jnp.float32)
                acc = term if acc is None else acc + term
        t1, t2 = acc[:hid], acc[hid:]
        g1 = _gelu_exact(t1)
        cp_dy.wait()
        du = dych[:].astype(jnp.float32).reshape(c, hc * w)   # (C, N)
        do = jax.lax.dot_general(
            wout, du, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(hid, hc, w)
        o = (g1 * t2).reshape(hid, hc * w)
        dwout_ref[:] += jax.lax.dot_general(
            o, du, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dt = jnp.concatenate(
            [do * t2 * _gelu_grad(t1), do * g1], axis=0)      # (2h, hc, W)
        y1f = y1p.astype(jnp.float32)
        for dh in range(3):
            for dw in range(3):
                dwdw_ref[dh, dw] += jnp.sum(
                    y1f[:, dh:dh + hc, dw:dw + w] * dt, axis=(1, 2))
        # transposed conv: dy1[row j, col cp] += k[dh,dw]*dt[j-dh, cp-dw]
        # in the (hc+2, W+2) halo frame; realized as 9 pad-and-add placements
        contrib = None
        for dh in range(3):
            for dw in range(3):
                kdt = dt * wdw[dh, dw][:, None, None]
                placed = jnp.pad(
                    kdt, ((0, 0), (dh, 2 - dh), (dw, 2 - dw)))
                contrib = placed if contrib is None else contrib + placed
        contrib = contrib[:, :, 1:w + 1]                      # (2h, hc+2, W)
        contrib = jnp.where(mask, contrib, 0.0)
        c2 = contrib.reshape(g2, (hc + 2) * w)
        dwin_ref[:] += jax.lax.dot_general(
            ln.astype(jnp.float32).reshape(c, (hc + 2) * w), c2,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dln_c = jax.lax.dot_general(
            winf, c2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(c, hc + 2, w)
        dlns[:, pl.ds(r0, hc + 2), :] += dln_c.astype(dlns.dtype)
        return 0

    jax.lax.fori_loop(0, h // hc, pass1, 0)

    def pass2(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(r0, hc), :], dych, sem_dy)
        cp_dy.start()
        xf = xp[:, pl.ds(r0 + 1, hc), :].astype(jnp.float32)
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        dln = dlns[:, pl.ds(r0 + 1, hc), :].astype(jnp.float32)
        dscale_ref[:] += jnp.sum(dln * xhat, axis=(1, 2))[None]
        dbias_ref[:] += jnp.sum(dln, axis=(1, 2))[None]
        ds = dln * scale[:, None, None]
        dxln = rstd * (ds - jnp.mean(ds, axis=0, keepdims=True)
                       - xhat * jnp.mean(ds * xhat, axis=0, keepdims=True))
        cp_dy.wait()
        stage[:] = dych[:] + dxln.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, dx_hbm.at[b, :, pl.ds(r0, hc), :], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, h // hc, pass2, 0)


def _any_spec():
    return pl.BlockSpec(memory_space=pl.ANY)


def _vmem_full(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _fwd_call(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc(h, w, c, g2)
    kern = functools.partial(_fwd_kernel, hc=hc, eps=eps, dtype=x.dtype)
    return pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(),
            _vmem_full((1, c)), _vmem_full((1, c)),
            _vmem_full((c, g2)), _vmem_full((3, 3, g2)),
            _vmem_full((hid, c)),
        ],
        out_specs=_any_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, h + 2, w), x.dtype),
            pltpu.VMEM((c, hc, w), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, scale.reshape(1, c), bias.reshape(1, c), w_in, w_dw, w_out)


def _bwd_call(x, dy, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc(h, w, c, g2)
    kern = functools.partial(_bwd_kernel, hc=hc, eps=eps, dtype=x.dtype)
    f32 = jnp.float32
    dx, dsc, dbi, dwi, dwd, dwo = pl.pallas_call(
        kern,
        grid=(bsz,),
        in_specs=[
            _any_spec(), _any_spec(),
            _vmem_full((1, c)), _vmem_full((1, c)),
            _vmem_full((c, g2)), _vmem_full((3, 3, g2)),
            _vmem_full((hid, c)),
        ],
        out_specs=[
            _any_spec(),
            _vmem_full((1, c)), _vmem_full((1, c)),
            _vmem_full((c, g2)), _vmem_full((3, 3, g2)),
            _vmem_full((hid, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, g2), f32),
            jax.ShapeDtypeStruct((3, 3, g2), f32),
            jax.ShapeDtypeStruct((hid, c), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, h + 2, w), x.dtype),
            pltpu.VMEM((c, h + 2, w), x.dtype),
            pltpu.VMEM((c, hc, w), x.dtype),
            pltpu.VMEM((c, hc, w), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(x, dy, scale.reshape(1, c), bias.reshape(1, c), w_in, w_dw, w_out)
    return dx, dsc.reshape(c), dbi.reshape(c), dwi, dwd, dwo


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_ln_gdfn(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
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


_fused_ln_gdfn.defvjp(_vjp_fwd, _vjp_bwd)


def supports(h: int, w: int) -> bool:
    """Shape gate: lane-aligned rows, chunkable columns."""
    return w % 128 == 0 and h % 8 == 0


def fused_ln_gdfn(x, scale, bias, w_in, w_dw, w_out, *, eps: float = 1e-5,
                  interpret: bool | None = None):
    """``x + GDFN(LayerNorm(x))`` on channels-first ``(B, C, H, W)``.

    scale/bias: LN affine ``(C,)``; w_in: project_in ``(C, 2h)``;
    w_dw: depthwise taps ``(3, 3, 2h)``; w_out: project_out ``(h, C)``.
    Weights may be f32 (cast in-kernel to x.dtype for the matmuls, like
    ``ops.Conv2d``).  ``interpret=None`` auto-selects interpreter mode off
    TPU backends (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if not supports(x.shape[2], x.shape[3]):
        raise ValueError(f"fused_ln_gdfn: unsupported spatial {x.shape}")
    return _fused_ln_gdfn(x, scale, bias, w_in, w_dw, w_out, float(eps),
                          bool(interpret))

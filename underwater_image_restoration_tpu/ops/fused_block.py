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
intermediates live in VMEM.

Layout (the part Mosaic dictates): every in-kernel tensor is 2D —
channels on sublanes, flattened ``rows*W`` spatial on lanes.  3D chunk
tensors hit unsupported lane->sublane relayouts (``(C,)->(C,1,1)`` channel
broadcasts, ``(C,R,W)<->(C,R*W)`` shape casts), so instead:

- per-channel constants are ``(C, 1)`` / ``(hid, 1)`` columns that broadcast
  along lanes;
- the 3x3 depthwise conv is 9 statically-offset slices of a guard-padded
  flat buffer: out[q] += tap * buf[q + (dh-1)*W + (dw-1)] — row shifts are
  lane offsets of +-W, column shifts +-1 with iota-%-W masks killing the
  row-wrap terms (zero-pad-equivalent);
- the 2h gated channels are split into a/b halves ON THE HOST (hid = 2.66*C
  is not sublane-aligned, so an in-kernel split would relayout), giving two
  aligned matmul/shift chains;
- grid = (B,): each program handles one image, row-chunked (``pick_hc``) so
  the f32 chunk intermediates fit VMEM; x / y stay in HBM
  (``memory_space=ANY``, pre-flattened to (B, C, H*W) by the host wrapper)
  and move via explicit async copies.

Numerics match the XLA path: LayerNorm statistics and affine in f32 (torch
semantics, like ops.LayerNorm), matmuls in the compute dtype with f32
accumulation, depthwise taps applied in f32, and erf evaluated with XLA's
own f32 rational expansion (Mosaic has no erf primitive) — ~5e-7 max abs
error vs lax.erf; the zero padding applies to the dwconv INPUT (project_in
output), so halo rows of the image are masked after project_in rather than
computed from zero-padded x.

The backward (custom VJP) recomputes the forward chain from x in VMEM
(FlashAttention-style residual policy: only x and the weights are saved),
so training stores no intermediates either.  Weight gradients accumulate in
f32 across the sequential TPU grid.  Restriction: no forward-mode AD
(jax.jvp) through this op — reverse-mode only, like
``ops.layers._depthwise_conv_hybrid``.

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


def _hc_force(h: int, kind: str = "") -> int | None:
    """UIRT_HC_FORCE (or the kernel-specific UIRT_HC_FORCE_<KIND>)
    overrides the pick_hc chunk height for hardware A/B sweeps (VERDICT r4
    next #2: wider chunks now that remat-skip freed VMEM).  Returns None
    unless set to a positive divisor of ``h``; numerics are
    chunk-size-invariant (equality-pinned across hc by the multichunk
    kernel tests), only VMEM/perf change — supports() lets Mosaic's own
    VMEM check arbitrate forced sizes."""
    import os

    v = None
    if kind:
        v = os.environ.get(f"UIRT_HC_FORCE_{kind.upper()}")
    if not v:
        v = os.environ.get("UIRT_HC_FORCE")
    if not v:
        return None
    hc = int(v)
    return hc if hc > 0 and h % hc == 0 else None


def _kabl(name: str) -> bool:
    """In-kernel ablation switch for TIMING ONLY (wrong numerics!).

    ``UIRT_KABL`` is a comma list of {nogelu, nomask, nostack, noln}; each
    stubs one in-kernel compute stage across every fused kernel so the
    chip prices the stage by difference (experiments/fused_microbench.py
    --kabl).  Read at trace time — never set outside microbenches."""
    import os

    return name in os.environ.get("UIRT_KABL", "").split(",")


def _gelu_exact(x):
    """erf GELU in f32 (torch nn.GELU default; see ops.layers.gelu)."""
    if _kabl("nogelu"):  # timing-only: identity
        return x
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


def _gelu_grad(x):
    """d/dx [x * Phi(x)] = Phi(x) + x * phi(x), f32."""
    if _kabl("nogelu"):  # timing-only: identity
        return jnp.ones_like(x)
    phi = jnp.exp(-0.5 * x * x) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + _erf_f32(x * (2.0 ** -0.5)))
    return cdf + x * phi


_TAPS = tuple((dh, dw) for dh in range(3) for dw in range(3))


def _scatter_taps_aligned(get_blk, dlnacc, accl, accr, masks_ext,
                          c: int, w: int, n: int):
    """Transposed-shift scatter of 9 tap cotangents into the zeroed f32
    frame ``dlnacc`` (C, n + 2W + 256): tap (dh, dw) lands at
    ``dlnacc[:, 128 + dh*w + (dw-1) + q]``, masked by the forward's
    ``masks[dw]`` on the cotangent positions q.

    Restructured for lane alignment (KABL pricing put the old per-tap
    form — 6 lane-misaligned (C, n) read-modify-writes — at ~18-21% of
    the banded backwards): each side column direction accumulates its 3
    dh taps into an ALIGNED (C, n+2W) frame (``accl``/``accr`` f32
    scratch; the first tap writes, sparing the zero-fill), then lands in
    ``dlnacc`` with ONE ±1-lane add and ONE mask multiply; the center
    taps add directly at aligned offsets.  Addition order differs from
    the per-tap form only by f32 reassociation.

    ``get_blk(k) -> (C, n)`` tap cotangent (any float dtype);
    ``masks_ext`` = ``_col_masks(w, n + 2*w, ...)``."""
    f32 = jnp.float32
    if _kabl("noscatter"):  # timing-only: dlnacc keeps its zeros
        return
    nw = n + 2 * w
    for d, acc in ((0, accl), (2, accr)):
        for dh in range(3):
            blk = get_blk(dh * 3 + d).astype(f32)
            if dh == 0:
                acc[:, pl.ds(0, n)] = blk
                acc[:, pl.ds(n, 2 * w)] = jnp.zeros((c, 2 * w), f32)
            else:
                acc[:, pl.ds(dh * w, n)] += blk
        fr = acc[:]
        if masks_ext[d] is not None:
            fr = fr * masks_ext[d]
        dlnacc[:, pl.ds(128 + d - 1, nw)] += fr
    for dh in range(3):
        dlnacc[:, pl.ds(128 + dh * w, n)] += get_blk(dh * 3 + 1).astype(f32)


def _w_ok(w: int) -> bool:
    """Width gate for the flat-(C, H*W) kernels.  All shift offsets,
    column masks, and frame arithmetic are fully general in W (the flat
    index's vertical neighbor is just ±W); the remaining constraints are
    lane-granularity ones: chunk sizes hc·W and the output-DMA bases
    r0·W must be 128-multiples, which W=64 satisfies for every even hc
    (all pick_hc candidates are even).  W=128k is the original gate;
    W=64 extends the banded/composed kernels to the 64² C=64 level
    (w=32 stays out: r0·32 bases break 128-alignment for hc=4k+2 and
    the level is ~3% of the step)."""
    return w % 128 == 0 or w == 64


def pick_hc(h: int, w: int, c: int, g: int) -> int:
    """Largest row-chunk (mult of 8, divides H) whose f32 per-half chunk
    intermediates (~4 live (hid, hc*W) f32 buffers) stay within a ~5 MB
    working-set budget — the whole-image x copy, the bf16 guard buffers and
    Mosaic's transient copies share the 16 MB VMEM."""
    for hc in (64, 32, 16, 8):
        if h % hc:
            continue
        if (g // 2) * hc * w * 4 * 4 <= 5 * 1024 * 1024:
            return hc
    return 8


def supports(h: int, w: int, c: int | None = None, hid: int | None = None,
             itemsize: int = 2) -> bool:
    """Shape gate: lane-aligned rows, chunkable columns; with (c, hid)
    also checks the whole-image VMEM scratch budget — the backward keeps
    x AND the dLN accumulator resident per image (1024^2 full-res would
    need a row-banded-DMA variant; the 256^2 headline shapes fit)."""
    if w % 128 or h % 8:
        return False
    if c is None or hid is None:
        return True
    g = 2 * hid
    img = c * (h + 2) * w * itemsize
    hc = pick_hc(h, w, c, g)
    chunk = hid * hc * w * 4 * 4 + 2 * g * (hc + 2) * w * itemsize
    return img + chunk <= 9 * 1024 * 1024


def _ln_flat(xf, scale, bias, eps):
    """LayerNorm over axis 0 (channels) of an f32 (C, N) chunk; affine in
    f32 like ops.LayerNorm.  Returns (ln, xhat, rstd)."""
    if _kabl("noln"):  # timing-only: passthrough with affine shapes intact
        return xf, xf, jnp.ones_like(xf[:1])
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    return xhat * scale + bias, xhat, rstd


def _col_masks(w: int, n: int, dtype=jnp.float32):
    """Lane masks killing row-wrapped column shifts: (1, n) ``dtype``, col =
    lane index mod W.  [dw] -> mask for the forward shift by (dw-1) columns.
    Multiplying by a 0/1 mask is exact in any float dtype, so stack builders
    pass the compute dtype to skip the f32 cast round-trip per element;
    f32 accumulation sites keep the default."""
    if _kabl("nomask"):  # timing-only: skip the wrap-column multiplies
        return {0: None, 1: None, 2: None}
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % w
    return {
        0: (col != 0).astype(dtype),             # left neighbor: col 0 wraps
        1: None,
        2: (col != w - 1).astype(dtype),         # right neighbor: col W-1
    }


def _row_mask(r0, hc: int, h: int, w: int, n2: int, halo: int = 1):
    """(1, n2) validity of a chunk window's rows [r0-halo, r0+hc+halo):
    only the first/last image chunks clip (whole rows => pure lane-range
    compare, no integer div)."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, n2), 1)
    lo = jnp.where(r0 == 0, halo * w, 0)
    hi = jnp.where(r0 + hc == h, n2 - halo * w, n2)
    return (q >= lo) & (q < hi)


def _dw_shift_acc(buf, taps, masks, p: int, w: int, n: int, dtype):
    """acc[q] = sum_k tap_k * buf[P + q + (dh-1)*W + (dw-1)], f32 (hid, n).

    buf: (hid, L) guard ref holding (masked) y1 at [P, P+N2); taps:
    (hid, 9) ref, k = dh*3+dw; the q-origin is row 1 of the chunk frame
    (first valid output row), so slice starts are the static ints
    P + dh*W + dw - 1."""
    acc = None
    for k, (dh, dw) in enumerate(_TAPS):
        s = p + dh * w + dw - 1
        tap = taps[:, k:k + 1].astype(jnp.float32)
        term = buf[:, pl.ds(s, n)].astype(jnp.float32) * tap
        if masks[dw] is not None:
            term = term * masks[dw]
        acc = term if acc is None else acc + term
    return acc


def _dw_shift_transpose(dtbuf, taps, masks2, p: int, w: int, n2: int):
    """Transposed conv: dy1[j] = sum_k tap_k * dt[q] with q = j - dh*W -
    dw + 1 (the forward read y1[j = q + dh*W + dw - 1]), over the (hid, n2)
    chunk frame; dt lives at [P+W, P+W+N) of dtbuf with zero guards, so
    out-of-chunk reads vanish and only column wraps need masks
    (masks2[dw]: receiving col +-1 off the row edge)."""
    acc = None
    for k, (dh, dw) in enumerate(_TAPS):
        s = p + w + 1 - dh * w - dw
        tap = taps[:, k:k + 1].astype(jnp.float32)
        term = dtbuf[:, pl.ds(s, n2)].astype(jnp.float32) * tap
        if masks2[dw] is not None:
            term = term * masks2[dw]
        acc = term if acc is None else acc + term
    return acc


def _zero_guards(ref, p: int, n2: int, dtype):
    hid = ref.shape[0]
    ref[:, 0:p] = jnp.zeros((hid, p), dtype)
    ref[:, p + n2:] = jnp.zeros((hid, ref.shape[1] - p - n2), dtype)


def _dma_x_window_start(x_hbm, b, xch, sem, i, nchunks: int, hc: int,
                        h: int, w: int, dtype, halo: int = 1):
    """Start the chunk-i halo-window DMA (see ``_dma_x_window``) WITHOUT
    waiting, zero-filling the out-of-image halo rows (disjoint from the
    in-flight DMA's target region).  Pair with ``_dma_x_window_wait``
    (same arguments) — the pipelined kernels start chunk i+1's fetch
    before computing chunk i."""
    c = xch.shape[0]
    hw = halo * w
    zrows = jnp.zeros((c, hw), dtype)
    if nchunks == 1:
        pltpu.make_async_copy(x_hbm.at[b],
                              xch.at[:, pl.ds(hw, h * w)], sem).start()
        xch[:, 0:hw] = zrows
        xch[:, hw + h * w:] = zrows
        return

    @pl.when(i == 0)
    def _first():
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(0, (hc + halo) * w)],
            xch.at[:, pl.ds(hw, (hc + halo) * w)], sem).start()
        xch[:, 0:hw] = zrows

    @pl.when(i == nchunks - 1)
    def _last():
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds((h - hc - halo) * w, (hc + halo) * w)],
            xch.at[:, pl.ds(0, (hc + halo) * w)], sem).start()
        xch[:, (hc + halo) * w:] = zrows

    @pl.when((i > 0) & (i < nchunks - 1))
    def _mid():
        # honest alignment hint: at w=64 with odd halo the window start
        # (i*hc - halo)*w is only a 64-multiple (pl.multiple_of is an
        # UNCHECKED promise — 128 here would miscompile the W=64 levels)
        al = 128 if (halo * w) % 128 == 0 else w
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(pl.multiple_of(i * hc * w - hw, al),
                                 (hc + 2 * halo) * w)],
            xch.at[:], sem).start()


def _dma_x_window_wait(x_hbm, b, xch, sem, i, nchunks: int, hc: int,
                       h: int, w: int, halo: int = 1):
    """Wait for the DMA started by ``_dma_x_window_start`` with the same
    arguments — reconstructs the matching copy descriptor per branch (the
    first/last windows move fewer bytes than the mid windows)."""
    hw = halo * w
    if nchunks == 1:
        pltpu.make_async_copy(x_hbm.at[b],
                              xch.at[:, pl.ds(hw, h * w)], sem).wait()
        return

    @pl.when(i == 0)
    def _first():
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(0, (hc + halo) * w)],
            xch.at[:, pl.ds(hw, (hc + halo) * w)], sem).wait()

    @pl.when(i == nchunks - 1)
    def _last():
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds((h - hc - halo) * w, (hc + halo) * w)],
            xch.at[:, pl.ds(0, (hc + halo) * w)], sem).wait()

    @pl.when((i > 0) & (i < nchunks - 1))
    def _mid():
        al = 128 if (halo * w) % 128 == 0 else w
        pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(pl.multiple_of(i * hc * w - hw, al),
                                 (hc + 2 * halo) * w)],
            xch.at[:], sem).wait()


def _dma_x_window(x_hbm, b, xch, sem, i, nchunks: int, hc: int, h: int,
                  w: int, dtype, halo: int = 1):
    """DMA the chunk-i halo window (rows i*hc-halo .. i*hc+hc+halo) of the
    flat (C, H*W) image into ``xch`` (C, (hc+2*halo)*W), zero-filling the
    out-of-image halo rows at the first/last chunk.  Whole-image VMEM
    copies blow the 16 MB scoped limit at C=32 (measured: backward
    17.94 M), so backward passes stream x per chunk instead.  halo=2
    serves cascaded 3x3 stages (fused MDTA's v -> out -> vf chain)."""
    _dma_x_window_start(x_hbm, b, xch, sem, i, nchunks, hc, h, w, dtype,
                        halo=halo)
    _dma_x_window_wait(x_hbm, b, xch, sem, i, nchunks, hc, h, w, halo=halo)


def _pipelined_loop(nchunks: int, start, wait, compute, slot0, slot1):
    """Lag-1 double-buffered streaming loop, slots statically unrolled
    (chunks 2j / 2j+1 -> slot0 / slot1): chunk i+1's fetch is started
    before chunk i's compute, hiding the DMA round-trip that the serial
    start-wait-compute pattern pays per chunk.  ``start(i, buf, sem)``
    begins chunk i's fetch, ``wait(i, buf, sem)`` blocks until landed,
    ``compute(i, buf)`` consumes it.  Serial fallback for odd nchunks
    (every supported model shape has even nchunks: H and hc are powers of
    two)."""
    buf0, sem0 = slot0
    buf1, sem1 = slot1
    if nchunks % 2 or nchunks < 2:
        def chunk(i, _):
            start(i, buf0, sem0)
            wait(i, buf0, sem0)
            compute(i, buf0)
            return 0

        jax.lax.fori_loop(0, nchunks, chunk, 0)
        return

    start(0, buf0, sem0)

    def pair(j, _):
        i0 = 2 * j
        start(i0 + 1, buf1, sem1)
        wait(i0, buf0, sem0)
        compute(i0, buf0)

        @pl.when(i0 + 2 < nchunks)
        def _pre():
            start(i0 + 2, buf0, sem0)

        wait(i0 + 1, buf1, sem1)
        compute(i0 + 1, buf1)
        return 0

    jax.lax.fori_loop(0, nchunks // 2, pair, 0)


def _fwd_kernel(x_hbm, scale_ref, bias_ref, wina_ref, winb_ref, tapa_ref,
                tapb_ref, wout_ref, out_hbm, xp, bufa, bufb, stage,
                sem_in, sem_out, *, hc: int, h: int, w: int, eps: float,
                dtype):
    c = xp.shape[0]
    hid = wina_ref.shape[1]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    b = pl.program_id(0)

    cp_in = pltpu.make_async_copy(x_hbm.at[b], xp.at[:, pl.ds(w, h * w)],
                                  sem_in)
    cp_in.start()
    # zero halo rows (their LN output is masked out of the dwconv input but
    # must stay finite) and the shift-guard lanes
    zrow = jnp.zeros((c, w), dtype)
    xp[:, 0:w] = zrow
    xp[:, w + h * w:] = zrow
    _zero_guards(bufa, p, n2, dtype)
    _zero_guards(bufb, p, n2, dtype)
    scale = scale_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)
    wina = wina_ref[:].astype(dtype)
    winb = winb_ref[:].astype(dtype)
    wout = wout_ref[:].astype(dtype)
    masks = _col_masks(w, n)
    cp_in.wait()

    def chunk(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        basei = pl.multiple_of(base + w, 128)
        xh = xp[:, pl.ds(base, n2)].astype(jnp.float32)
        ln, _, _ = _ln_flat(xh, scale, bias, eps)
        ln = ln.astype(dtype)
        rmask = _row_mask(r0, hc, h, w, n2)
        for win, buf in ((wina, bufa), (winb, bufb)):
            y1 = jax.lax.dot_general(
                win, ln, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            buf[:, pl.ds(p, n2)] = jnp.where(rmask, y1, 0.0).astype(dtype)
        t1 = _dw_shift_acc(bufa, tapa_ref, masks, p, w, n, dtype)
        t2 = _dw_shift_acc(bufb, tapb_ref, masks, p, w, n, dtype)
        o = (_gelu_exact(t1) * t2).astype(dtype)
        u = jax.lax.dot_general(
            wout, o, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        stage[:] = xp[:, pl.ds(basei, n)] + u.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, out_hbm.at[b, :, pl.ds(base, n)], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, h // hc, chunk, 0)


def _bwd_kernel(x_hbm, dy_hbm, scale_ref, bias_ref, wina_ref, winb_ref,
                tapa_ref, tapb_ref, wout_ref, dx_hbm, dscale_ref, dbias_ref,
                dwina_ref, dwinb_ref, dtapa_ref, dtapb_ref, dwout_ref,
                xch, dlns, bufa, bufb, dtbufa, dtbufb, dych, stage,
                sem_in, sem_dy, sem_out, *, hc: int, h: int, w: int,
                eps: float, dtype):
    c = xch.shape[0]
    hid = wina_ref.shape[1]
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    nchunks = h // hc
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        for ref in (dscale_ref, dbias_ref, dwina_ref, dwinb_ref,
                    dtapa_ref, dtapb_ref, dwout_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    dlns[:] = jnp.zeros(dlns.shape, dlns.dtype)
    _zero_guards(bufa, p, n2, dtype)
    _zero_guards(bufb, p, n2, dtype)
    _zero_guards(dtbufa, p + w, n, dtype)
    _zero_guards(dtbufb, p + w, n, dtype)
    scale = scale_ref[:].astype(jnp.float32)
    bias = bias_ref[:].astype(jnp.float32)
    wina = wina_ref[:].astype(dtype)
    winb = winb_ref[:].astype(dtype)
    wout = wout_ref[:].astype(dtype)
    masks = _col_masks(w, n)
    masks2 = {0: _col_masks(w, n2)[2], 1: None, 2: _col_masks(w, n2)[0]}

    def pass1(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        basei = pl.multiple_of(base + w, 128)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base, n)], dych, sem_dy)
        cp_dy.start()
        _dma_x_window(x_hbm, b, xch, sem_in, i, nchunks, hc, h, w, dtype)
        xh = xch[:].astype(jnp.float32)
        ln, _, _ = _ln_flat(xh, scale, bias, eps)
        ln = ln.astype(dtype)
        rmask = _row_mask(r0, hc, h, w, n2)
        for win, buf in ((wina, bufa), (winb, bufb)):
            y1 = jax.lax.dot_general(
                win, ln, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            buf[:, pl.ds(p, n2)] = jnp.where(rmask, y1, 0.0).astype(dtype)
        t1 = _dw_shift_acc(bufa, tapa_ref, masks, p, w, n, dtype)
        t2 = _dw_shift_acc(bufb, tapb_ref, masks, p, w, n, dtype)
        g1 = _gelu_exact(t1)
        cp_dy.wait()
        du = dych[:].astype(dtype)
        do = jax.lax.dot_general(
            wout, du, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (hid, n)
        o = (g1 * t2).astype(dtype)
        dwout_ref[:, :] += jax.lax.dot_general(
            o, du, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (hid, c)
        dta = do * t2 * _gelu_grad(t1)
        dtb = do * g1
        # dt rounds to the compute dtype here, as the XLA path's dwconv
        # input-grad does when it materializes dt in bf16
        dtbufa[:, pl.ds(p + w, n)] = dta.astype(dtype)
        dtbufb[:, pl.ds(p + w, n)] = dtb.astype(dtype)
        # tap grads: dtap_k = sum_q y1[q + off_k] * dt[q] (same masks as fwd)
        for buf, dt, dtap in ((bufa, dta, dtapa_ref), (bufb, dtb, dtapb_ref)):
            for k, (dh, dw) in enumerate(_TAPS):
                s = p + dh * w + dw - 1
                term = buf[:, pl.ds(s, n)].astype(jnp.float32) * dt
                if masks[dw] is not None:
                    term = term * masks[dw]
                dtap[:, k:k + 1] += jnp.sum(term, axis=1, keepdims=True)
        dln = None
        for win, taps, dtbuf, dwin in (
                (wina, tapa_ref, dtbufa, dwina_ref),
                (winb, tapb_ref, dtbufb, dwinb_ref)):
            dy1 = _dw_shift_transpose(dtbuf, taps, masks2, p, w, n2)
            dy1 = jnp.where(rmask, dy1, 0.0).astype(dtype)
            dwin[:, :] += jax.lax.dot_general(
                ln, dy1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (c, hid)
            d = jax.lax.dot_general(
                win, dy1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (c, n2)
            dln = d if dln is None else dln + d
        dlns[:, pl.ds(base, n2)] += dln.astype(dlns.dtype)
        return 0

    jax.lax.fori_loop(0, h // hc, pass1, 0)

    def pass2(i, _):
        r0 = pl.multiple_of(i * hc, hc)
        base = pl.multiple_of(r0 * w, 128)
        basei = pl.multiple_of(base + w, 128)
        cp_dy = pltpu.make_async_copy(
            dy_hbm.at[b, :, pl.ds(base, n)], dych, sem_dy)
        cp_dy.start()
        cp_x = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(base, n)], xch.at[:, pl.ds(0, n)], sem_in)
        cp_x.start()
        cp_x.wait()
        xf = xch[:, pl.ds(0, n)].astype(jnp.float32)
        mean = jnp.mean(xf, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (xf - mean) * rstd
        dln = dlns[:, pl.ds(basei, n)].astype(jnp.float32)
        dscale_ref[:, :] += jnp.sum(dln * xhat, axis=1, keepdims=True)
        dbias_ref[:, :] += jnp.sum(dln, axis=1, keepdims=True)
        ds = dln * scale
        dxln = rstd * (ds - jnp.mean(ds, axis=0, keepdims=True)
                       - xhat * jnp.mean(ds * xhat, axis=0, keepdims=True))
        cp_dy.wait()
        stage[:] = dych[:] + dxln.astype(dtype)
        cp_out = pltpu.make_async_copy(
            stage, dx_hbm.at[b, :, pl.ds(base, n)], sem_out)
        cp_out.start()
        cp_out.wait()
        return 0

    jax.lax.fori_loop(0, h // hc, pass2, 0)


def _any_spec():
    return pl.BlockSpec(memory_space=pl.ANY)


def _vmem_full(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _split_weights(scale, bias, w_in, w_dw, w_out):
    """Host-side reshapes into the kernel's aligned 2D layouts."""
    c, g2 = w_in.shape
    hid = g2 // 2
    taps = w_dw.reshape(9, g2).T  # (2h, 9), k = dh*3+dw
    return (scale.reshape(c, 1), bias.reshape(c, 1),
            w_in[:, :hid], w_in[:, hid:], taps[:hid], taps[hid:], w_out)


def _fwd_call(x, scale, bias, w_in, w_dw, w_out, eps, interpret):
    bsz, c, h, w = x.shape
    g2 = w_in.shape[1]
    hid = g2 // 2
    hc = pick_hc(h, w, c, g2)
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
            pltpu.VMEM((c, (h + 2) * w), x.dtype),
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
    hc = pick_hc(h, w, c, g2)
    n, n2 = hc * w, (hc + 2) * w
    p = w + 128
    kern = functools.partial(_bwd_kernel, hc=hc, h=h, w=w, eps=eps,
                             dtype=x.dtype)
    f32 = jnp.float32
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
            pltpu.VMEM((c, (h + 2) * w), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((hid, n2 + 2 * p), x.dtype),
            pltpu.VMEM((hid, n + 2 * (p + w)), x.dtype),
            pltpu.VMEM((hid, n + 2 * (p + w)), x.dtype),
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

"""Haar DWT/IDWT with custom VJP matching the reference's hand-written
autograd (reference ``src/model/wave_modules.py``).

The reference builds Haar filters from pywt (``wave_modules.py:120-139``) and
*broadcast-expands* the single 2x2 filter to a dense ``(C/4, C, 2, 2)`` conv
weight (``wave_modules.py:143-147``).  Because every (out, in) pair holds the
same 2x2 filter, the convolution collapses analytically:

- DWT forward (``wave_modules.py:17-25``): each band is the Haar filter applied
  to the *channel sum* of the input, replicated C/4 times.  Band order
  [ll, lh, hl, hh], output C channels at H/2 x W/2.
- IDWT forward (``wave_modules.py:59-77``): after the band interleave, output
  channel 4g+o is the transposed Haar filter ``rec_o`` applied to the *sum of
  the four bands* of channel g (bands for channel g live at n*C/4+g).

With stride == kernel == 2 the convolutions reduce to a per-pixel 4x4 matmul
against pixel-(un)shuffled data — the TPU-native formulation used here (no
stride-2 conv at all; XLA fuses the reshape+matmul).

The reference's backward passes are **not** the true adjoints
(``wave_modules.py:27-56`` permutes bands before the transposed conv;
``wave_modules.py:79-117`` mixes spatial pixels into channels via raw
reshapes).  Training parity requires matching those gradients, so both ops
carry a ``jax.custom_vjp`` that replays the reference backward computation
(same NCHW reshapes, same convs) rather than the analytic adjoint.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .resample import pixel_shuffle, pixel_unshuffle

_SQ = 1.0 / np.sqrt(2.0)
# pywt 'haar': dec_lo=[s,s], dec_hi=[-s,s]; the reference reverses dec filters
# (wave_modules.py:123-124) giving dec_lo=[s,s], dec_hi=[s,-s]; rec filters are
# used un-reversed (wave_modules.py:160-161): rec_lo=[s,s], rec_hi=[s,-s].
_DEC_LO = np.array([_SQ, _SQ], dtype=np.float32)
_DEC_HI = np.array([_SQ, -_SQ], dtype=np.float32)
_REC_LO = np.array([_SQ, _SQ], dtype=np.float32)
_REC_HI = np.array([_SQ, -_SQ], dtype=np.float32)


def _outer(row, col):
    # reference: w[i, j] = row[j] * col[i]  (unsqueeze(0) * unsqueeze(1))
    return col[:, None] * row[None, :]


# 2x2 filters, band order [ll, lh, hl, hh] matching the forward concat order
# (wave_modules.py:23).  lh = lo(width) x hi(height), hl = hi(width) x lo(height).
_DEC_FILTERS = np.stack(
    [
        _outer(_DEC_LO, _DEC_LO),
        _outer(_DEC_LO, _DEC_HI),
        _outer(_DEC_HI, _DEC_LO),
        _outer(_DEC_HI, _DEC_HI),
    ]
)  # (4, 2, 2)
_REC_FILTERS = np.stack(
    [
        _outer(_REC_LO, _REC_LO),
        _outer(_REC_LO, _REC_HI),
        _outer(_REC_HI, _REC_LO),
        _outer(_REC_HI, _REC_HI),
    ]
)  # (4, 2, 2)

# (4 pixel-positions i*2+j, 4 bands) matrix for the matmul formulation.
_DEC_MAT = _DEC_FILTERS.reshape(4, 4).T.copy()  # [pos, band]
_REC_MAT = _REC_FILTERS.reshape(4, 4).copy()  # [band(o), pos]


def _torch_conv(x_nchw, w_oihw, stride: int):
    return lax.conv_general_dilated(
        x_nchw,
        w_oihw,
        window_strides=(stride, stride),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _torch_conv_transpose(x_nchw, w_iohw, stride: int):
    """torch F.conv_transpose2d(x, w, stride) with weight (in, out, kh, kw)."""
    k = w_iohw.shape[-1]
    w = jnp.transpose(w_iohw, (1, 0, 2, 3))[:, :, ::-1, ::-1]
    return lax.conv_general_dilated(
        x_nchw,
        w,
        window_strides=(1, 1),
        padding=[(k - 1, k - 1), (k - 1, k - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


# --------------------------------------------------------------------------
# DWT
# --------------------------------------------------------------------------


@jax.custom_vjp
def dwt2d(x):
    """Reference-semantics DWT.  x: (B, H, W, C) -> (B, H/2, W/2, C).

    Channel layout of the output: [ll * C/4, lh * C/4, hl * C/4, hh * C/4]
    where every channel within a band is identical (a consequence of the
    reference's broadcast filters — see module docstring).
    """
    return _dwt2d_fwd_impl(x)


def _dwt2d_fwd_impl(x):
    b, h, w, c = x.shape
    assert c % 4 == 0, f"dwt2d requires channels % 4 == 0, got {c}"
    q = c // 4
    s = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)  # (B,H,W,1)
    patches = pixel_unshuffle(s, 2)  # (B,H/2,W/2,4) pos order i*2+j
    bands = patches @ jnp.asarray(_DEC_MAT)  # (B,H/2,W/2,4) band order
    out = jnp.repeat(bands, q, axis=-1)  # [ll x q, lh x q, hl x q, hh x q]
    return out.astype(x.dtype)


def _dwt2d_fwd(x):
    return _dwt2d_fwd_impl(x), None


def _dwt2d_bwd(res, g):
    """Replays DWT_function.backward (wave_modules.py:27-56):
    rearrange 'b (n c) h w -> b c n h w' -> reshape -> conv_transpose2d with
    the concatenated broadcast filters, stride 2."""
    del res
    b, h2, w2, c = g.shape
    h, w = 2 * h2, 2 * w2
    dtype = g.dtype
    q = c // 4
    gn = jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2))  # NCHW (B,C,H/2,W/2)
    # rearrange 'b (n c) h w -> b c n h w' then flatten -> channel i = cc*4+n
    gp = gn.reshape(b, 4, q, h // 2, w // 2)
    gp = jnp.transpose(gp, (0, 2, 1, 3, 4)).reshape(b, c, h // 2, w // 2)
    # filters = cat([w_ll,w_lh,w_hl,w_hh]) each expanded to (q, c, 2, 2):
    # conv_transpose weight (in=c, out=c, 2, 2); row i holds band (i // q)
    # broadcast over all out channels -> out[o] identical for every o:
    #   out = sum_i convT(gp[i], f_{i//q})
    group_sums = jnp.sum(gp.reshape(b, 4, q, h // 2, w // 2), axis=2)  # (B,4,h/2,w/2)
    # convT stride2 k2 == per-band scatter: out[2h+i,2w+j] += s_b * f_b[i,j];
    # the backward uses the (dec) filters saved in ctx (wave_modules.py:30,41).
    scat = jnp.einsum("bnhw,nij->bhwij", group_sums, jnp.asarray(_DEC_FILTERS))
    scat = scat.reshape(b, h // 2, w // 2, 4)  # pos order i*2+j
    dx1 = pixel_shuffle(scat, 2)  # (B, H, W, 1)
    dx = jnp.broadcast_to(dx1, (b, h, w, c)).astype(dtype)
    return (dx,)


dwt2d.defvjp(_dwt2d_fwd, _dwt2d_bwd)


# --------------------------------------------------------------------------
# IDWT
# --------------------------------------------------------------------------


@jax.custom_vjp
def idwt2d(x):
    """Reference-semantics IDWT.  x: (B, H, W, C) -> (B, 2H, 2W, C).

    Input band layout [ll*C/4, lh*C/4, hl*C/4, hh*C/4] (DWT output order).
    Output channel 4g+o = rec-filter o applied to the sum of the CONSECUTIVE
    input channels [4g:4g+4] — the reference's interleaving rearranges cancel
    out (wave_modules.py:68-71 both use '(n c)'), so the grouped
    conv_transpose consumes consecutive quadruples of the bands-major layout.
    """
    return _idwt2d_fwd_impl(x)


def _idwt2d_fwd_impl(x):
    b, h, w, c = x.shape
    q = c // 4
    xf = x.astype(jnp.float32)
    # group g sums CONSECUTIVE channels [4g:4g+4]: the reference's two
    # rearranges at wave_modules.py:68-71 cancel out (both use '(n c)'), so
    # despite the apparent interleave, conv_transpose2d with groups=C/4
    # consumes consecutive quadruples of the bands-major layout
    s = jnp.sum(xf.reshape(b, h, w, q, 4), axis=-1)  # (B,H,W,q)
    # out[2h+i, 2w+j, 4g+o] = s[h, w, g] * rec_o[i, j]
    scat = jnp.einsum("bhwg,oij->bhwgoij", s, jnp.asarray(_REC_FILTERS))
    scat = scat.reshape(b, h, w, q * 4 * 4)  # channel order (g, o, i, j)
    out = pixel_shuffle(scat, 2)  # (B, 2H, 2W, 4q)
    return out.astype(x.dtype)


def _idwt2d_fwd(x):
    return _idwt2d_fwd_impl(x), None


def _idwt2d_true_adjoint(g):
    """Analytic adjoint of _idwt2d_fwd_impl:
    dx[h,w,4g+o'] = sum_{o,i,j} g[2h+i, 2w+j, 4g+o] * rec_o[i,j]."""
    b, c = g.shape[0], g.shape[3]
    gp = pixel_unshuffle(g.astype(jnp.float32), 2)  # channels (c, i, j)
    h, w = gp.shape[1], gp.shape[2]
    gp = gp.reshape(b, h, w, c // 4, 4, 2, 2)
    ds = jnp.einsum("bhwgoij,oij->bhwg", gp, jnp.asarray(_REC_FILTERS))
    return (jnp.repeat(ds, 4, axis=-1).astype(g.dtype),)


def _idwt2d_bwd(res, g):
    """Replays IDWT_function.backward (wave_modules.py:79-117) including its
    raw NCHW reshapes that mix spatial pixels into channels.

    The replay's reshapes require the input height/width to be multiples of
    4; below that the reference itself crashes (its reshape hits zero dims),
    so for tiny maps — reachable only in tests with miniature image sizes —
    the TRUE adjoint of the forward is used instead."""
    del res
    b, c = g.shape[0], g.shape[3]
    h, w = g.shape[1] // 2, g.shape[2] // 2
    if h % 4 or w % 4:
        return _idwt2d_true_adjoint(g)
    dtype = g.dtype
    gn = jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2))  # (B, C, 2H, 2W)
    # dx = dx.reshape(B, -1, H//2, W//2): pure view reshape in NCHW
    gm = gn.reshape(b, -1, h // 2, w // 2)  # (B, 16C, H/2, W/2)
    dim = gm.shape[1]
    qd = dim // 4
    # per band: conv2d(gm, w_band expanded (dim//4, dim, 2, 2), stride 2)
    # == band filter applied to the channel sum, replicated dim//4 times
    sm = jnp.sum(gm, axis=1, keepdims=True)  # (B,1,H/2,W/2)
    sm_nhwc = jnp.transpose(sm, (0, 2, 3, 1))
    patches = pixel_unshuffle(sm_nhwc, 2)  # (B,H/4,W/4,4)
    # IDWT backward convolves with the *rec* filters saved in ctx
    # (wave_modules.py:96-108), built from the un-reversed rec_lo/rec_hi.
    bands = patches @ jnp.asarray(_REC_MAT.T)  # (pos, band)
    bands = jnp.transpose(bands, (0, 3, 1, 2))  # (B,4,H/4,W/4)
    h4, w4 = h // 4, w // 4
    # dx_b = conv result replicated qd times then reshape(B, -1, H, W)
    out_bands = []
    for n in range(4):
        db = jnp.broadcast_to(bands[:, n : n + 1], (b, qd, h4, w4))
        db = db.reshape(b, -1, h, w)  # (B, qd*h4*w4/(h*w), H, W) = (B, C/4, H, W)
        out_bands.append(db)
    dx_nchw = jnp.concatenate(out_bands, axis=1)  # (B, C, H, W)
    dx = jnp.transpose(dx_nchw, (0, 2, 3, 1)).astype(dtype)
    return (dx,)


idwt2d.defvjp(_idwt2d_fwd, _idwt2d_bwd)

"""Golden tests for the reference-semantics Haar DWT/IDWT.

The oracle is an independent torch implementation of the reference's
broadcast-filter convolutions (wave_modules.py semantics described in
SURVEY.md #18): build the expanded (C/4, C, 2, 2) filters explicitly and run
the actual conv2d/conv_transpose2d — then check the analytic matmul
formulation in ops/wavelets.py agrees, forward and backward.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from underwater_image_restoration_tpu.ops import dwt2d, idwt2d

SQ = 1.0 / np.sqrt(2.0)
DEC_LO = torch.tensor([SQ, SQ])
DEC_HI = torch.tensor([SQ, -SQ])  # pywt dec_hi reversed
REC_LO = torch.tensor([SQ, SQ])
REC_HI = torch.tensor([SQ, -SQ])


def _w(row, col):
    return (row.unsqueeze(0) * col.unsqueeze(1)).float()


W_LL, W_LH, W_HL, W_HH = (
    _w(DEC_LO, DEC_LO),
    _w(DEC_LO, DEC_HI),
    _w(DEC_HI, DEC_LO),
    _w(DEC_HI, DEC_HH := DEC_HI),
)
REC_FILTERS = torch.stack(
    [_w(REC_LO, REC_LO), _w(REC_LO, REC_HI), _w(REC_HI, REC_LO), _w(REC_HI, REC_HI)]
)


class TorchRefDWT(torch.autograd.Function):
    """Oracle replicating the reference DWT autograd semantics."""

    @staticmethod
    def forward(ctx, x):
        B, C, H, W = x.shape
        ctx.shape = x.shape
        q = C // 4
        outs = [
            TF.conv2d(x, w.expand(q, C, 2, 2), stride=2)
            for w in (W_LL, W_LH, W_HL, W_HH)
        ]
        return torch.cat(outs, dim=1)

    @staticmethod
    def backward(ctx, dx):
        B, C, H, W = ctx.shape
        q = C // 4
        dxp = dx.reshape(B, 4, q, H // 2, W // 2).transpose(1, 2).reshape(
            B, C, H // 2, W // 2
        )
        filters = torch.cat([w.expand(q, C, 2, 2) for w in (W_LL, W_LH, W_HL, W_HH)], 0)
        return TF.conv_transpose2d(dxp, filters, stride=2)


class TorchRefIDWT(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x):
        B, C, H, W = x.shape
        ctx.shape = x.shape
        q = C // 4
        xp = x.reshape(B, 4, q, H, W).transpose(1, 2).reshape(B, C, H, W)
        filters = REC_FILTERS.expand(C, 4, 2, 2)
        return TF.conv_transpose2d(xp, filters, stride=2, groups=q)

    @staticmethod
    def backward(ctx, dx):
        B, C, H, W = ctx.shape
        dx = dx.contiguous().reshape(B, -1, H // 2, W // 2)
        dim = dx.shape[1]
        outs = []
        for n in range(4):
            w = REC_FILTERS[n].expand(dim // 4, dim, 2, 2)
            o = TF.conv2d(dx, w, stride=2)
            outs.append(o.reshape(B, -1, H, W))
        return torch.cat(outs, dim=1)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_dwt_forward_matches_reference_semantics(rng):
    x = rng.standard_normal((2, 8, 8, 8), dtype=np.float32)
    y = dwt2d(jnp.asarray(x))
    yt = TorchRefDWT.apply(_nchw(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(yt), atol=1e-5)


def test_dwt_backward_matches_reference_semantics(rng):
    x = rng.standard_normal((1, 8, 8, 8), dtype=np.float32)
    ct = rng.standard_normal((1, 4, 4, 8), dtype=np.float32)
    _, vjp = jax.vjp(dwt2d, jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(ct))
    xt = _nchw(x).requires_grad_(True)
    yt = TorchRefDWT.apply(xt)
    yt.backward(_nchw(ct))
    np.testing.assert_allclose(np.asarray(dx), _nhwc(xt.grad), atol=1e-5)


def test_idwt_forward_matches_reference_semantics(rng):
    x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    y = idwt2d(jnp.asarray(x))
    assert y.shape == (2, 8, 8, 8)
    yt = TorchRefIDWT.apply(_nchw(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(yt), atol=1e-5)


def test_idwt_backward_matches_reference_semantics(rng):
    x = rng.standard_normal((1, 4, 4, 8), dtype=np.float32)
    ct = rng.standard_normal((1, 8, 8, 8), dtype=np.float32)
    _, vjp = jax.vjp(idwt2d, jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(ct))
    xt = _nchw(x).requires_grad_(True)
    yt = TorchRefIDWT.apply(xt)
    yt.backward(_nchw(ct))
    np.testing.assert_allclose(np.asarray(dx), _nhwc(xt.grad), atol=1e-5)

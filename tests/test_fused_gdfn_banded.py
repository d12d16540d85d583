"""Banded fused LN+GDFN kernel (ops/fused_gdfn_banded.py) equality tests.

Run on CPU via the Pallas interpreter.  Pins:

- the banded kernel vs the same pure-jnp transcription that pins
  ``fused_block`` (test_fused_block._unfused), forward and all six
  gradients, across multi-chunk banding (the rolling lag-1 LayerNorm
  finalization is the new machinery vs the whole-image kernel);
- the ``SpectralBlock`` dispatch under UIRT_GDFN_BANDED=1 — same param
  tree and same outputs/grads as the whole-image fused path and the
  unfused path (reference SpectralTransformer.py:117-148).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.ops import fused_gdfn_banded
from underwater_image_restoration_tpu.ops.fused_gdfn_banded import (
    fused_ln_gdfn_banded,
    pick_hc,
    supports,
)

B, C, H, W = 2, 8, 16, 128
HID = int(C * 2.66)  # 21 — deliberately sublane-unaligned, like the model
G2 = 2 * HID


def _unfused(x, scale, bias, w_in, w_dw, w_out):
    """jnp transcription of LayerNorm_C + GDFN + residual on (B,C,H,W) —
    same as test_fused_block's, with the gate split taken from w_out."""
    h, w = x.shape[2], x.shape[3]
    hid = w_out.shape[0]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    ln = (ln * scale[None, :, None, None] + bias[None, :, None, None]
          ).astype(x.dtype)
    y1 = jnp.einsum("bchw,cg->bghw", ln, w_in.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(x.dtype)
    y1p = jnp.pad(y1, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = 0.0
    for dh in range(3):
        for dw in range(3):
            acc = acc + (y1p[:, :, dh:dh + h, dw:dw + w]
                         * w_dw[dh, dw].astype(x.dtype)[None, :, None, None]
                         ).astype(jnp.float32)
    t1, t2 = acc[:, :hid], acc[:, hid:]
    gel = 0.5 * t1 * (1 + jax.lax.erf(t1 * (2.0 ** -0.5)))
    o = (gel * t2).astype(x.dtype)
    u = jnp.einsum("bghw,gc->bchw", o, w_out.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x + u


def _args(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1 + 1.0
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
    w_in = jnp.asarray(rng.standard_normal((C, G2)), jnp.float32) * 0.2
    w_dw = jnp.asarray(rng.standard_normal((3, 3, G2)), jnp.float32) * 0.2
    w_out = jnp.asarray(rng.standard_normal((HID, C)), jnp.float32) * 0.2
    return x, scale, bias, w_in, w_dw, w_out


def test_supports_gate():
    # the whole point: the reference train res (1024²) qualifies at BOTH
    # its full-res channel widths (the composed-matmul design carries no
    # hid-sized guard buffers, so even C=32 @ 1024² fits)
    assert supports(1024, 1024, 16, int(16 * 2.66))
    assert supports(1024, 1024, 32, int(32 * 2.66))
    assert supports(512, 512, 32, int(32 * 2.66))
    assert supports(256, 256, 16, int(16 * 2.66))
    assert not supports(256, 192) and not supports(13, 128)
    assert not supports(16, 128, 6, 15)  # c % 8


def _check_all(hc_override=None, monkeypatch=None):
    args = _args()
    if hc_override is not None:
        monkeypatch.setattr(fused_gdfn_banded, "pick_hc",
                            lambda *a: hc_override)
    y_ref = _unfused(*args)
    y_f = fused_ln_gdfn_banded(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

    g_ref = jax.grad(loss(_unfused), argnums=tuple(range(6)))(*args)
    g_f = jax.grad(loss(fused_ln_gdfn_banded),
                   argnums=tuple(range(6)))(*args)
    names = ["dx", "dscale", "dbias", "dwin", "dwdw", "dwout"]
    for name, a, b in zip(names, g_ref, g_f):
        ref = np.asarray(a)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(b), ref, rtol=1e-4, atol=tol,
                                   err_msg=name)


def test_banded_matches_unfused_single_chunk():
    _check_all()  # H=16 picks hc=16 -> nchunks == 1 (DMA corner branch)


def test_banded_matches_unfused_multichunk(monkeypatch):
    """hc=4 -> 4 chunks: exercises the halo DMA first/mid/last branches
    and the rolling lag-1 dLN finalization across chunk boundaries."""
    _check_all(hc_override=4, monkeypatch=monkeypatch)


def test_banded_matches_unfused_two_chunks(monkeypatch):
    """hc=8 -> 2 chunks: first chunk is also the lag-1 predecessor of the
    post-loop finalization (no mid-window DMA branch)."""
    _check_all(hc_override=8, monkeypatch=monkeypatch)


def _block_apply(env: dict, monkeypatch):
    from underwater_image_restoration_tpu.models.spectral_transformer import (
        SpectralBlock,
    )

    for k in ("UIRT_FUSED_GDFN", "UIRT_GDFN_BANDED", "UIRT_FUSED_ATTN"):
        monkeypatch.setenv(k, env.get(k, "0"))
    blk = SpectralBlock(channels=C, num_heads=2, expansion_factor=2.66,
                        dtype=jnp.float32, channels_first=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, C, H, W)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)

    def loss(p, z):
        return jnp.sum(jnp.tanh(blk.apply(p, z)))

    y = blk.apply(params, x)
    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    return params, y, gp, gx


def test_banded_w64_matches_unfused(monkeypatch):
    """W=64 (the 64² C=64 level's width, _w_ok extension): column masks,
    shift offsets and DMA windows are general in W — pin fwd + all six
    grads at a two-chunk W=64 shape."""
    rng = np.random.default_rng(7)
    c, h, w = 8, 8, 64
    hid = int(c * 2.66)
    args = (
        jnp.asarray(rng.standard_normal((2, c, h, w)), jnp.float32),
        jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.1 + 1.0,
        jnp.asarray(rng.standard_normal(c), jnp.float32) * 0.1,
        jnp.asarray(rng.standard_normal((c, 2 * hid)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal((3, 3, 2 * hid)), jnp.float32) * 0.2,
        jnp.asarray(rng.standard_normal((hid, c)), jnp.float32) * 0.2,
    )
    assert supports(h, w, c, hid)
    monkeypatch.setattr(fused_gdfn_banded, "pick_hc", lambda *a: 4)
    y_ref = _unfused(*args)
    y_f = fused_ln_gdfn_banded(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

    g_ref = jax.grad(loss(_unfused), argnums=tuple(range(6)))(*args)
    g_f = jax.grad(loss(fused_ln_gdfn_banded),
                   argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["dx", "dscale", "dbias", "dwin", "dwdw",
                           "dwout"], g_ref, g_f):
        ref = np.asarray(a)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(b), ref, rtol=1e-4, atol=tol,
                                   err_msg=name)


def test_spectral_block_banded_dispatch_matches(monkeypatch):
    """UIRT_GDFN_BANDED=1 (banded fused) vs UIRT_FUSED_GDFN=0 (unfused):
    same param tree, same outputs, same grads."""
    p0, y0, gp0, gx0 = _block_apply({}, monkeypatch)
    p1, y1, gp1, gx1 = _block_apply(
        {"UIRT_FUSED_GDFN": "1", "UIRT_GDFN_BANDED": "1"}, monkeypatch)
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-4, atol=2e-5)
    flat1 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(gp1)}
    for k, v in jax.tree_util.tree_leaves_with_path(gp0):
        ks = jax.tree_util.keystr(k)
        ref = np.asarray(v)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(flat1[ks]), ref, rtol=1e-4,
                                   atol=tol, err_msg=ks)

"""Fused LN+GDFN Pallas kernel (ops/fused_block.py) equality tests.

Run on CPU via the Pallas interpreter (``fused_ln_gdfn`` auto-selects
interpret mode off-TPU).  Two layers of pinning:

- the raw kernel vs a pure-jnp transcription of the XLA path
  (LayerNorm -> 1x1 -> depthwise 3x3 -> gelu-gate -> 1x1 -> residual),
  forward and all six gradients;
- the ``SpectralBlock`` dispatch (UIRT_FUSED_GDFN=1 vs =0) — same params
  tree, same outputs, same grads, so converted checkpoints are oblivious
  to which path runs (reference SpectralTransformer.py:117-148).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.models.spectral_transformer import (
    SpectralBlock,
)
from underwater_image_restoration_tpu.ops.fused_block import (
    fused_ln_gdfn,
    pick_hc,
    supports,
)

B, C, H, W = 2, 6, 16, 128
HID = int(C * 2.66)
G2 = 2 * HID


def _args(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1 + 1.0
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
    w_in = jnp.asarray(rng.standard_normal((C, G2)), jnp.float32) * 0.2
    w_dw = jnp.asarray(rng.standard_normal((3, 3, G2)), jnp.float32) * 0.2
    w_out = jnp.asarray(rng.standard_normal((HID, C)), jnp.float32) * 0.2
    return x, scale, bias, w_in, w_dw, w_out


def _unfused(x, scale, bias, w_in, w_dw, w_out):
    """jnp transcription of LayerNorm_C + GDFN + residual on (B,C,H,W)."""
    h, w = x.shape[2], x.shape[3]
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
    t1, t2 = acc[:, :HID], acc[:, HID:]
    gel = 0.5 * t1 * (1 + jax.lax.erf(t1 * (2.0 ** -0.5)))
    o = (gel * t2).astype(x.dtype)
    u = jnp.einsum("bghw,gc->bchw", o, w_out.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x + u


def test_supports_gate():
    assert supports(256, 256) and supports(16, 128)
    assert not supports(256, 192) and not supports(13, 128)
    assert pick_hc(H, W, C, G2) in (8, 16)


def test_fused_kernel_matches_unfused_forward_and_grads():
    args = _args()
    y_ref = _unfused(*args)
    y_f = fused_ln_gdfn(*args)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

    g_ref = jax.grad(loss(_unfused), argnums=tuple(range(6)))(*args)
    g_f = jax.grad(loss(fused_ln_gdfn), argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["dx", "dscale", "dbias", "dwin", "dwdw", "dwout"],
                          g_ref, g_f):
        ref = np.asarray(a)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(b), ref, atol=tol,
                                   err_msg=name)


def test_fused_kernel_multichunk_matches(monkeypatch):
    """Force hc=8 (H=16 -> 2 chunks) so the edge-window DMAs, guard-buffer
    reuse, and cross-chunk dlns halo accumulation are all exercised (the
    natural pick_hc covers these tiny shapes in one chunk)."""
    import underwater_image_restoration_tpu.ops.fused_block as fb

    monkeypatch.setattr(fb, "pick_hc", lambda h, w, c, g: 8)
    args = _args(seed=2)
    y_ref = _unfused(*args)
    np.testing.assert_allclose(np.asarray(fused_ln_gdfn(*args)),
                               np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.tanh(fn(*a)))

    g_ref = jax.grad(loss(_unfused), argnums=tuple(range(6)))(*args)
    g_f = jax.grad(loss(fused_ln_gdfn), argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["dx", "dscale", "dbias", "dwin", "dwdw", "dwout"],
                          g_ref, g_f):
        ref = np.asarray(a)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(b), ref, atol=tol,
                                   err_msg=name)


@pytest.fixture
def block_setup(monkeypatch):
    monkeypatch.setenv("UIRT_CHW", "1")
    m = SpectralBlock(channels=C, num_heads=1, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, C, H, W)),
                    jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_GDFN", "1")
    params = m.init(jax.random.PRNGKey(0), x)
    return m, params, x


def test_spectral_block_fused_dispatch_matches(block_setup, monkeypatch):
    m, params, x = block_setup

    def run():
        def f(p):
            return jnp.sum(jnp.tanh(m.apply(p, x)))
        return m.apply(params, x), jax.grad(f)(params)

    monkeypatch.setenv("UIRT_FUSED_GDFN", "1")
    y_f, g_f = run()
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")
    y_u, g_u = run()
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=2e-5, atol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_u = jax.tree_util.tree_leaves_with_path(g_u)
    assert [p for p, _ in flat_f] == [p for p, _ in flat_u]
    for (path, a), (_, b) in zip(flat_f, flat_u):
        ref = np.asarray(b)
        tol = 2e-5 * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(a), ref, atol=tol,
                                   err_msg=jax.tree_util.keystr(path))


def test_param_tree_identical_across_dispatch(block_setup, monkeypatch):
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")
    params_u = m.init(jax.random.PRNGKey(0), x)
    pf = jax.tree_util.tree_leaves_with_path(params)
    pu = jax.tree_util.tree_leaves_with_path(params_u)
    assert [p for p, _ in pf] == [p for p, _ in pu]
    for (path, a), (_, b) in zip(pf, pu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))

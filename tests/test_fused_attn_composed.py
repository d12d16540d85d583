"""Composed-matmul fused LN+MDTA kernel (ops/fused_attn_composed.py) tests.

Run on CPU via the Pallas interpreter.  The unfused channels-first MDTA
path is the oracle (itself pinned against NHWC and the torch reference —
test_chw_blocks_match, test_convert.py); toggling UIRT_ATTN_COMPOSED on a
SpectralBlock pins the composed kernel transitively: same params, same
outputs, same grads (including the attnf/kf/q1x1_1 dead-code quirks,
reference SpectralTransformer.py:102-114).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.models.spectral_transformer import (
    SpectralBlock,
)
from underwater_image_restoration_tpu.ops import fused_attn_composed

B, C, NH, H, W = 1, 8, 2, 16, 128


def test_supports_gate():
    assert fused_attn_composed.supports(256, 256, 16)
    assert fused_attn_composed.supports(128, 128, 32)
    assert fused_attn_composed.supports(16, 128, 8)
    assert not fused_attn_composed.supports(16, 192, 8)   # lanes
    assert not fused_attn_composed.supports(16, 128, 6)   # sublane-unaligned
    # 1024^2 keeps whole-image VMEM residents -> stays unsupported
    assert not fused_attn_composed.supports(1024, 1024, 16)


@pytest.fixture
def block_setup(monkeypatch):
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")  # isolate the MDTA half
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, C, H, W)), jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "1")
    params = m.init(jax.random.PRNGKey(0), x)
    return m, params, x


def _run(m, params, x):
    def f(p):
        return jnp.sum(jnp.tanh(m.apply(p, x)))

    return m.apply(params, x), jax.grad(f)(params)


def _assert_tree_close(got, want, tol_scale=3e-5):
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    assert [p for p, _ in flat_g] == [p for p, _ in flat_w]
    for (path, a), (_, b) in zip(flat_g, flat_w):
        ref = np.asarray(b)
        tol = tol_scale * max(1.0, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(a), ref, atol=tol,
                                   err_msg=jax.tree_util.keystr(path))


def test_spectral_block_composed_attn_matches(block_setup, monkeypatch):
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "1")
    y_c, g_c = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_c, g_u)


def test_composed_matches_shiftmac_kernel(block_setup, monkeypatch):
    """Composed vs the proven shift-MAC fused kernel: same dispatch site,
    same params — pins the two fused variants against each other."""
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "1")
    y_c, g_c = _run(m, params, x)
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "0")
    y_s, g_s = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_s),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_c, g_s)


def test_composed_multichunk_matches(block_setup, monkeypatch):
    """hc=8 (H=16 -> 2 chunks): edge-window DMAs, stack/guard buffer reuse
    across the four backward passes, halo accumulation in douts/dxl."""
    m, params, x = block_setup
    monkeypatch.setattr(fused_attn_composed, "pick_hc",
                        lambda h, w, c: 8)
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "1")
    y_c, g_c = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_c, g_u)


def test_composed_w64_matches_unfused(monkeypatch):
    """W=64 (the 64² C=64 level, _w_ok extension): pin the composed
    kernel's fwd + grads against the unfused chw path at a two-chunk
    W=64 shape."""
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((B, C, 8, 64)),
        jnp.float32)
    assert fused_attn_composed.supports(8, 64, C)
    monkeypatch.setattr(fused_attn_composed, "pick_hc", lambda h, w, c: 4)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "1")
    params = m.init(jax.random.PRNGKey(0), x)
    y_c, g_c = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_c, g_u)


def test_composed_rejects_unsupported():
    x = jnp.zeros((1, 6, 16, 128), jnp.float32)
    with pytest.raises(ValueError, match="unsupported"):
        fused_attn_composed.fused_ln_mdta_composed(
            x, jnp.ones(6), jnp.zeros(6), jnp.zeros((6, 18)),
            jnp.zeros((3, 3, 18)), jnp.ones((1, 2, 1, 1)),
            jnp.zeros((6, 6)), jnp.zeros((6, 12)), jnp.zeros((3, 3, 12)),
            jnp.zeros((6, 6)), num_heads=2)

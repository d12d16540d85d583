"""Fused LN+MDTA Pallas kernel (ops/fused_attn.py) equality tests.

Run on CPU via the Pallas interpreter.  The unfused channels-first MDTA
path is the oracle — it is itself pinned against the NHWC path and the
torch reference (test_chw_blocks_match, test_convert.py) — so toggling
UIRT_FUSED_ATTN on a SpectralBlock pins the fused kernel transitively:
same params, same outputs, same grads (including the attnf/kf/q1x1_1
dead-code quirks, reference SpectralTransformer.py:102-114).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.models.spectral_transformer import (
    SpectralBlock,
)
from underwater_image_restoration_tpu.ops import fused_attn

B, C, NH, H, W = 1, 8, 2, 16, 128


def test_supports_gate():
    assert fused_attn.supports(256, 256, 16)
    assert fused_attn.supports(16, 128, 8)
    assert not fused_attn.supports(16, 192, 8)   # lanes
    assert not fused_attn.supports(16, 128, 6)   # sublane-unaligned C


@pytest.fixture
def block_setup(monkeypatch):
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")  # isolate the MDTA half
    # pin the SHIFT-MAC kernel: auto now prefers the composed variant
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "0")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, C, H, W)), jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
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


def test_spectral_block_fused_attn_matches(block_setup, monkeypatch):
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    y_f, g_f = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_f, g_u)


def test_fused_attn_multichunk_matches(block_setup, monkeypatch):
    """hc=8 (H=16 -> 2 chunks): edge-window DMAs, guard-buffer reuse
    across the four backward passes, halo accumulation in douts/dxl."""
    m, params, x = block_setup
    monkeypatch.setattr(fused_attn, "pick_hc", lambda h, w, c: 8)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    y_f, g_f = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_f, g_u)


def test_param_tree_identical_across_dispatch(block_setup, monkeypatch):
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    params_u = m.init(jax.random.PRNGKey(0), x)
    pf = jax.tree_util.tree_leaves_with_path(params)
    pu = jax.tree_util.tree_leaves_with_path(params_u)
    assert [p for p, _ in pf] == [p for p, _ in pu]
    for (path, a), (_, b) in zip(pf, pu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))

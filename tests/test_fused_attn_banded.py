"""Banded fused LN+MDTA kernel (ops/fused_attn_banded.py) tests.

Run on CPU via the Pallas interpreter.  The unfused channels-first MDTA
path is the oracle (itself pinned against NHWC and the torch reference);
forcing UIRT_ATTN_BANDED=1 on a SpectralBlock pins the banded kernel
transitively: same params, same outputs, same grads (including the
attnf/kf/q1x1_1 dead-code quirks, reference
SpectralTransformer.py:102-114).  Multi-chunk cases exercise the rolling
lag-1 d(out)/dLN pipelines and the HBM dLN_v scratch round-trip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.models.spectral_transformer import (
    SpectralBlock,
)
from underwater_image_restoration_tpu.ops import fused_attn_banded

B, C, NH, H, W = 1, 8, 2, 16, 128


def test_supports_gate():
    # the whole point: the 1024^2 reference train res qualifies
    assert fused_attn_banded.supports(1024, 1024, 16)
    assert fused_attn_banded.supports(512, 512, 32)
    assert fused_attn_banded.supports(256, 256, 64)
    assert fused_attn_banded.supports(16, 128, 8)
    assert not fused_attn_banded.supports(16, 192, 8)   # lanes
    assert not fused_attn_banded.supports(16, 128, 6)   # sublane-unaligned


@pytest.fixture
def block_setup(monkeypatch):
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")  # isolate the MDTA half
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((B, C, H, W)),
        jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
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


def test_spectral_block_banded_attn_matches(block_setup, monkeypatch):
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
    y_b, g_b = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_b, g_u)


def test_banded_multichunk_matches(block_setup, monkeypatch):
    """hc=8 on H=16 -> 2 chunks: both lag-1 pipelines roll at least once
    and the dLN_v HBM scratch carries finalized chunks across loops."""
    m, params, x = block_setup
    monkeypatch.setattr(fused_attn_banded, "pick_hc", lambda h, w, c: 8)
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
    y_b, g_b = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_b, g_u)


def test_banded_four_chunks_matches(monkeypatch):
    """H=32 at hc=8 -> 4 chunks: interior chunks hit the mid-window DMA
    path and the pipelines carry across more than one boundary."""
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")
    monkeypatch.setattr(fused_attn_banded, "pick_hc", lambda h, w, c: 8)
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(13).standard_normal((B, C, 32, W)),
        jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
    params = m.init(jax.random.PRNGKey(0), x)
    y_b, g_b = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_b, g_u)


def test_banded_w64_matches_unfused(monkeypatch):
    """W=64 (the 64² C=64 level's width, _w_ok extension): the stats loop
    must fetch the aligned halo-2 enclosure (odd x 64 DMA slices violate
    Mosaic's 128-multiple rule) and slice the halo-1 LN frame at offset w
    — the advisor-r4 crash path.  Forward and grads vs the unfused path
    at a two-chunk W=64 shape."""
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")
    monkeypatch.setattr(fused_attn_banded, "pick_hc", lambda h, w, c: 4)
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(19).standard_normal((B, C, 8, 64)),
        jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
    params = m.init(jax.random.PRNGKey(0), x)
    y_b, g_b = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_b, g_u)


def test_banded_matches_composed(block_setup, monkeypatch):
    """Banded vs the whole-image composed kernel at a shape both support:
    pins the two fused variants against each other."""
    m, params, x = block_setup
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
    y_b, g_b = _run(m, params, x)
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    monkeypatch.setenv("UIRT_ATTN_COMPOSED", "1")
    y_c, g_c = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_c),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_b, g_c)


def test_banded_batch2(monkeypatch):
    """grid=(2,): per-image stats blocks and weight-grad accumulation
    across programs."""
    monkeypatch.setenv("UIRT_CHW", "1")
    monkeypatch.setenv("UIRT_FUSED_GDFN", "0")
    m = SpectralBlock(channels=C, num_heads=NH, expansion_factor=2.66,
                      channels_first=True)
    x = jnp.asarray(
        np.random.default_rng(17).standard_normal((2, C, H, W)),
        jnp.float32)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "1")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "1")
    params = m.init(jax.random.PRNGKey(0), x)
    y_b, g_b = _run(m, params, x)
    monkeypatch.setenv("UIRT_FUSED_ATTN", "0")
    monkeypatch.setenv("UIRT_ATTN_BANDED", "0")
    y_u, g_u = _run(m, params, x)
    np.testing.assert_allclose(np.asarray(y_b), np.asarray(y_u),
                               rtol=3e-5, atol=3e-5)
    _assert_tree_close(g_b, g_u)

"""Model-zoo smoke + invariant tests.

The reference has no tests; these follow SURVEY.md §4's prescription:
per-model shape tests on tiny CPU-runnable configs, gradient-flow checks,
and registry behavior.

Tiny shapes only — this box has 1 CPU core.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu import models


def _run(model, x, key=0):
    params = model.init(jax.random.key(key), x)
    return model.apply(params, x), params


def test_registry_names():
    assert set(models.get_names()) == {
        "SpectralTransformer",
        "NewModel",
        "NewBigModel",
        "NewBigFRFNModel",
        "AST",
    }


def test_registry_use_dwt_dropped_for_spectral():
    m = models.init_model("SpectralTransformer", use_dwt="Wavelet")
    assert isinstance(m, models.SpectralTransformer)


def test_registry_unknown_raises():
    with pytest.raises(KeyError):
        models.init_model("NoSuchModel")


def test_spectral_transformer_forward_shape(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    # tiny config: 1 block per level, small channels
    m = models.SpectralTransformer(
        num_blocks=(1, 1, 1, 1), num_heads=(1, 1, 2, 2),
        channels=(8, 16, 32, 64), num_refinement=1,
    )
    y, params = _run(m, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_attn_layouts_match(rng, monkeypatch):
    """The spatial-major (blhc, default) and torch-shaped (bhcl) MDTA
    layouts are the same math routed through different memory layouts —
    forward AND gradients must agree to reduction-order tolerance."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    m = models.SpectralTransformer(
        num_blocks=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
        channels=(8, 16, 32, 64), num_refinement=1,
    )

    def run():
        params = m.init(jax.random.PRNGKey(0), x)
        y, g = jax.value_and_grad(
            lambda p: jnp.sum(jnp.tanh(m.apply(p, x))))(params)
        return y, g

    monkeypatch.setenv("UIRT_ATTN_LAYOUT", "blhc")
    y1, g1 = run()
    monkeypatch.setenv("UIRT_ATTN_LAYOUT", "bhcl")
    y2, g2 = run()
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3), g1, g2)


def test_chw_blocks_match(rng, monkeypatch):
    """The channels-first block layout (UIRT_CHW=1; spatial minor dims, no
    lane padding) is the same math as NHWC — forward AND gradients must
    agree to reduction-order tolerance, with an identical param tree."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
    # channels (4, 8, ...) straddle the C < W policy boundary at 16x16:
    # levels 0-1 (C=4<W=16, C=8<W=8? no: 8==8 stays NHWC) — level 0 flips
    # to channels-first, deeper levels stay NHWC
    m = models.SpectralTransformer(
        num_blocks=(1, 1, 1, 1), num_heads=(1, 2, 2, 4),
        channels=(4, 8, 16, 32), num_refinement=1,
    )

    def run():
        params = m.init(jax.random.PRNGKey(0), x)
        y, g = jax.value_and_grad(
            lambda p: jnp.sum(jnp.tanh(m.apply(p, x))))(params)
        return y, g

    monkeypatch.setenv("UIRT_CHW", "0")
    y1, g1 = run()
    monkeypatch.setenv("UIRT_CHW", "1")
    y2, g2 = run()
    assert jax.tree.structure(g1) == jax.tree.structure(g2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3), g1, g2)


def test_chw_scan_blocks_match(rng, monkeypatch):
    """Channels-first composes with the scanned (small-HLO) stage layout."""
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    kw = dict(num_blocks=(2, 1, 1, 1), num_heads=(1, 2, 2, 4),
              channels=(4, 8, 16, 32), num_refinement=2)
    m_scan = models.SpectralTransformer(scan_blocks=True, **kw)
    monkeypatch.setenv("UIRT_CHW", "1")
    params = m_scan.init(jax.random.PRNGKey(0), x)
    y_scan = m_scan.apply(params, x)
    monkeypatch.setenv("UIRT_CHW", "0")
    y_plain = m_scan.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_plain),
                               rtol=2e-5, atol=1e-5)


def test_new_model_forward_fourier(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    m = models.NewModel(img_size=32, embed_dim=8, use_dwt="Fourier")
    y, _ = _run(m, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_new_model_forward_wavelet(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    m = models.NewModel(img_size=32, embed_dim=8, use_dwt="Wavelet")
    y, _ = _run(m, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_new_big_frfn_forward(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    m = models.NewBigFRFNModel(img_size=32, embed_dim=8, use_dwt="Fourier")
    y, _ = _run(m, x)
    assert y.shape == (1, 32, 32, 3)


def test_ast_forward(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    m = models.AST(img_size=16, embed_dim=8, win_size=4)
    y, params = _run(m, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_ast_trunc_normal_reinit(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    m = models.AST(img_size=16, embed_dim=8, win_size=4)
    params = m.init(jax.random.key(0), x)
    re = models.reinit_linear_trunc_normal(params, jax.random.key(1))
    flat = jax.tree_util.tree_flatten_with_path(re)[0]
    seen_dense = 0
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", None) for p in path)
        if keys[-1] == "kernel" and leaf.ndim == 2:
            seen_dense += 1
            assert float(jnp.max(jnp.abs(leaf))) <= 0.04 + 1e-6  # 2*std
    assert seen_dense > 10
    # forward still works after re-init
    y = m.apply(re, x)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow  # 133s full-model grad on the 1-core CPU
def test_spectral_gradients_flow(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    m = models.SpectralTransformer(
        num_blocks=(1, 1, 1, 1), num_heads=(1, 1, 2, 2),
        channels=(8, 16, 32, 64), num_refinement=1,
    )
    params = m.init(jax.random.key(0), x)

    def loss(p):
        return jnp.mean(jnp.abs(m.apply(p, x)))

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(v)) for v in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    # the overwhelming majority of parameters must receive gradient
    nonzero = sum(n > 0 for n in norms)
    assert nonzero / len(norms) > 0.9

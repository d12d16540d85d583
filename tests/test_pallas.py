"""Pallas fused window-attention kernel vs the pure-JAX core (interpret mode
on CPU; the same kernel compiles for real on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.ops.attention import (
    window_attention_core,
)
from underwater_image_restoration_tpu.ops.pallas import window_attention


def _mk(bq=6, h=2, n=64, m=64, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (bq, h, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (bq, h, m, d), jnp.float32)
    v = jax.random.normal(ks[2], (bq, h, m, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, n, m), jnp.float32) * 0.1
    w = jax.random.normal(ks[4], (2,), jnp.float32)
    return q, k, v, bias, w


@pytest.mark.parametrize("sparse", [False, True])
def test_forward_matches_core(sparse):
    q, k, v, bias, w = _mk()
    sw = w if sparse else None
    want = window_attention_core(q, k, v, bias, scale=0.17, sparse_w=sw)
    got = window_attention(q, k, v, bias, scale=0.17, sparse_w=sw,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_forward_with_shift_mask():
    nw = 3
    q, k, v, bias, w = _mk(bq=2 * nw)
    mask = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(9), 0.3, (nw, 64, 64)),
        -100.0, 0.0).astype(jnp.float32)
    want = window_attention_core(q, k, v, bias, scale=0.17, sparse_w=w,
                                 mask=mask)
    got = window_attention(q, k, v, bias, scale=0.17, sparse_w=w, mask=mask,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_core():
    q, k, v, bias, w = _mk(bq=4)

    def loss_pallas(q, k, v, bias, w):
        return jnp.sum(window_attention(q, k, v, bias, scale=0.2, sparse_w=w,
                                        interpret=True) ** 2)

    def loss_core(q, k, v, bias, w):
        return jnp.sum(window_attention_core(q, k, v, bias, scale=0.2,
                                             sparse_w=w) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, w)
    gc = jax.grad(loss_core, argnums=(0, 1, 2, 3, 4))(q, k, v, bias, w)
    for a, b in zip(gp, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_bf16_inputs():
    q, k, v, bias, w = _mk()
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))
    want = window_attention_core(qb, kb, vb, bias, scale=0.17, sparse_w=w)
    got = window_attention(qb, kb, vb, bias, scale=0.17, sparse_w=w,
                           interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_dispatcher_uses_core_on_cpu():
    from underwater_image_restoration_tpu.ops.attention import (
        window_attention as dispatch,
    )

    q, k, v, bias, w = _mk(bq=2)
    want = window_attention_core(q, k, v, bias, scale=0.17, sparse_w=w)
    got = dispatch(q, k, v, bias, scale=0.17, sparse_w=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_pick_g_respects_vmem_budget():
    from underwater_image_restoration_tpu.ops.pallas import (
        _VMEM_BUDGET, _pick_g,
    )

    def padded_per_g(h, n, m, d):
        r = lambda x, mult: -(-x // mult) * mult
        return h * (3 * r(n, 8) * r(d, 128) * 6 + r(n, 8) * r(m, 128) * 12
                    + r(n, 8) * r(d, 128) * 6)

    # AST bottleneck (16 heads) and New* small-head-dim (d=8) shapes — the
    # two configs that OOM'd scoped VMEM at G=32 on real hardware
    for h, d in ((16, 32), (4, 8), (1, 32)):
        g = _pick_g(8192, h=h, n=64, m=64, d=d)
        assert 1 <= g <= 32
        assert g * padded_per_g(h, 64, 64, d) <= _VMEM_BUDGET
    assert _pick_g(8192, h=16, n=64, m=64, d=32) < \
        _pick_g(8192, h=1, n=64, m=64, d=32)


def test_kernel_16_heads_interpret():
    q, k, v, bias, w = _mk(bq=4, h=16, n=64, m=64, d=32)
    want = window_attention_core(q, k, v, bias, scale=0.17, sparse_w=w)
    got = window_attention(q, k, v, bias, scale=0.17, sparse_w=w,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

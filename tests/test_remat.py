"""Per-block remat must not change values or gradients (it only trades
compute for activation memory)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.models import init_model


@pytest.mark.slow  # 137-207s/model on the 1-core CPU
@pytest.mark.parametrize("arch,kw", [
    ("SpectralTransformer", {}),
    ("AST", {"img_size": 16}),
    ("NewModel", {"img_size": 16, "use_dwt": "Fourier"}),
])
def test_remat_preserves_values_and_grads(arch, kw):
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3), jnp.float32)
    base = init_model(arch, **kw)
    rem = init_model(arch, remat=True, **kw)
    params = base.init(jax.random.PRNGKey(1), x)

    y0 = base.apply(params, x)
    y1 = rem.apply(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    g0 = jax.grad(lambda p: jnp.sum(base.apply(p, x) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(rem.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("policy", ["mxu", "mxu+ew", "dots"])
def test_remat_policy_preserves_values_and_grads(policy):
    """Named checkpoint policies change WHAT the backward recomputes, never
    the math: values and grads must match plain remat bit-for-bit (same
    forward graph, f32)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3), jnp.float32)
    base = init_model("SpectralTransformer", remat=True)
    pol = init_model("SpectralTransformer", remat=True, remat_policy=policy)
    params = base.init(jax.random.PRNGKey(1), x)

    np.testing.assert_allclose(np.asarray(base.apply(params, x)),
                               np.asarray(pol.apply(params, x)), atol=1e-6)
    g0 = jax.grad(lambda p: jnp.sum(base.apply(p, x) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(pol.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_remat_policy_unknown_name_raises():
    from underwater_image_restoration_tpu.ops import make_remat

    with pytest.raises(ValueError):
        make_remat(True, "bogus")
    # identity when remat is off, whatever the policy
    assert make_remat(False, "bogus")(jnp.sin) is jnp.sin

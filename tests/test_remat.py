"""Per-block remat must not change values or gradients (it only trades
compute for activation memory)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_restoration_tpu.models import init_model


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

"""scan_blocks equality: lax.scan over stacked per-block params must be
numerically identical to the unrolled per-block forward.

The scanned form exists to shrink HLO size (one block body per stage
instead of num_blocks[i]) so the remote compile service stops 500-ing on
large-batch/large-res programs (PERF_NOTES.md compile-host ceiling); it
must never change numerics — reference checkpoints are converted to the
per-block layout first (tools/convert_checkpoint.py) and then restacked
with stack_scan_params.
"""
import jax
import jax.numpy as jnp
import numpy as np

from underwater_image_restoration_tpu.models import init_model
from underwater_image_restoration_tpu.models.spectral_transformer import (
    stack_scan_params,
)


def test_spectral_scan_blocks_matches_unrolled():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 16, 3)).astype(np.float32))
    m0 = init_model("SpectralTransformer")
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
    m1 = init_model("SpectralTransformer", scan_blocks=True)
    v1 = stack_scan_params(v0)

    # the stacked layout matches what scan_blocks=True init produces
    want_shapes = jax.tree.map(lambda a: a.shape,
                               jax.eval_shape(m1.init,
                                              jax.random.PRNGKey(0), x))
    got_shapes = jax.tree.map(lambda a: a.shape, v1)
    assert want_shapes == got_shapes

    y0 = m0.apply(v0, x)
    y1 = m1.apply(v1, x)
    # same op sequence, different fusion boundaries (scan body compiles
    # once): f32 roundoff only
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-6)


def test_spectral_scan_blocks_remat_grad_matches():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 16, 16, 3)).astype(np.float32))
    m0 = init_model("SpectralTransformer", remat=True)
    v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
    m1 = init_model("SpectralTransformer", remat=True, scan_blocks=True)
    v1 = stack_scan_params(v0)

    def loss(m, v):
        return lambda xx: jnp.sum(m.apply(v, xx) ** 2)

    g0 = jax.grad(loss(m0, v0))(x)
    g1 = jax.grad(loss(m1, v1))(x)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               atol=5e-5, rtol=1e-4)

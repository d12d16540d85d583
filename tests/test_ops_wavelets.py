"""Golden tests for the reference-semantics Haar DWT/IDWT.

The oracle is the reference's OWN ``wave_modules.py`` (imported read-only
from /root/reference with dependency stubs — see ref_oracle.py): the analytic
matmul formulation in ops/wavelets.py must agree with the real
``DWT_2D``/``IDWT_2D`` autograd Functions, forward and backward, including
their non-adjoint backward quirks (SURVEY.md #18) and the cancelled-out
interleave in the IDWT forward (wave_modules.py:68-71).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import ref_oracle
from underwater_image_restoration_tpu.ops import dwt2d, idwt2d


@pytest.fixture(scope="module")
def wave():
    return ref_oracle.load_reference_module(
        "src/model/wave_modules.py", "ref_wave_modules")


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_dwt_forward_matches_reference(wave, rng):
    x = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    y = dwt2d(jnp.asarray(x))
    assert y.shape == (2, 4, 4, 8)
    yt = wave.DWT_2D()(_nchw(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(yt), atol=1e-5)


def test_dwt_backward_matches_reference(wave, rng):
    x = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    ct = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    _, vjp = jax.vjp(dwt2d, jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(ct))
    xt = _nchw(x).requires_grad_(True)
    yt = wave.DWT_2D()(xt)
    yt.backward(_nchw(ct))
    np.testing.assert_allclose(np.asarray(dx), _nhwc(xt.grad), atol=1e-5)


def test_idwt_forward_matches_reference(wave, rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    y = idwt2d(jnp.asarray(x))
    assert y.shape == (2, 8, 8, 8)
    yt = wave.IDWT_2D()(_nchw(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(yt), atol=1e-5)


def test_idwt_backward_matches_reference(wave, rng):
    x = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    ct = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    _, vjp = jax.vjp(idwt2d, jnp.asarray(x))
    (dx,) = vjp(jnp.asarray(ct))
    xt = _nchw(x).requires_grad_(True)
    yt = wave.IDWT_2D()(xt)
    yt.backward(_nchw(ct))
    np.testing.assert_allclose(np.asarray(dx), _nhwc(xt.grad), atol=1e-5)


def test_dwt_larger_channels_and_batch(wave, rng):
    """Non-square-ish config: C=32, different H/W."""
    x = rng.standard_normal((2, 16, 8, 32)).astype(np.float32)
    y = dwt2d(jnp.asarray(x))
    yt = wave.DWT_2D()(_nchw(x))
    np.testing.assert_allclose(np.asarray(y), _nhwc(yt), atol=1e-5)
    z = idwt2d(y)
    zt = wave.IDWT_2D()(torch.from_numpy(_nhwc(yt).transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(z), _nhwc(zt), atol=1e-5)

"""Checkpoint converter parity: a randomly-initialized reference
SpectralTransformer (torch, loaded directly from /root/reference) converted
via tools.convert_checkpoint must produce the SAME outputs as our flax model
— full end-to-end model-graph numerical parity."""
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from underwater_image_restoration_tpu.models import init_model
from underwater_image_restoration_tpu.tools.convert_checkpoint import (
    convert_state_dict,
)

REF_FILE = "/root/reference/src/Models/SpectralTransformer.py"


@pytest.fixture(scope="module")
def ref_module():
    spec = importlib.util.spec_from_file_location("ref_spectral", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch_model(ref_module):
    torch.manual_seed(0)
    m = ref_module.SpectralTransformer()
    m.eval()
    return m


def test_convert_covers_full_tree(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_state_dict("SpectralTransformer", sd)

    model = init_model("SpectralTransformer")
    want = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    want_flat = {"/".join(str(k.key) for k in p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    got_flat = {"/".join(str(k.key) for k in p): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert set(got_flat) == set(want_flat)
    for k in want_flat:
        assert got_flat[k] == want_flat[k], k


def test_converted_forward_matches_torch(torch_model):
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_state_dict("SpectralTransformer", sd)
    model = init_model("SpectralTransformer")

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)

    with torch.no_grad():
        want = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)

    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_unknown_arch_raises():
    with pytest.raises(NotImplementedError):
        convert_state_dict("AST", {})

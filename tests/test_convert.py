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
        convert_state_dict("NoSuchModel", {})


# --------------------------------------------------------------------------
# AST and the New* family (oracles loaded with dependency stubs — see
# ref_oracle.py)
# --------------------------------------------------------------------------
import ref_oracle  # noqa: E402


def _flatpaths(tree):
    return {"/".join(str(k.key) for k in p): tuple(v.shape)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _coverage(arch, sd, model, x_shape):
    variables = convert_state_dict(arch, sd)
    want = _flatpaths(jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros(x_shape, jnp.float32)))
    got = _flatpaths(variables)
    assert set(got) == set(want), (
        f"missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}")
    for k in want:
        assert got[k] == want[k], k
    return variables


def test_ast_convert_and_forward_parity():
    mod = ref_oracle.load_ast_module()
    torch.manual_seed(0)
    m = mod.AST(img_size=64)
    m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    variables = _coverage("AST", sd, init_model("AST", img_size=64),
                          (1, 64, 64, 3))
    x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(init_model("AST", img_size=64).apply(
        variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _new_family_oracle(m, x):
    """Drive the reference submodules in the working order — the reference's
    own MyModel/MyBigModel.forward crashes (tokens into output_proj convs at
    model.py:272; undefined adaptive_pool/conv_super_* at model.py:396,449)."""
    import math

    with torch.no_grad():
        y = m.input_proj(x)
        skips = []
        for lvl in range(4):
            y = getattr(m, f"encoder_{lvl}")(y)
            if hasattr(m, f"encoder_{lvl}_1"):
                y = getattr(m, f"encoder_{lvl}_1")(y)
            skips.append(y)
            y = getattr(m, f"downsample_{lvl}")(y)
        y = m.bottleneck(y)
        for lvl in (3, 2, 1, 0):
            y = getattr(m, f"upsample_{lvl}")(y)
            y = getattr(m, f"decoder_{lvl}")(y, enc_out=skips[lvl])
            if hasattr(m, f"decoder_{lvl}_1"):
                y = getattr(m, f"decoder_{lvl}_1")(y)
        b, l, c = y.shape
        h = w = int(math.sqrt(l))
        img = y.transpose(1, 2).reshape(b, c, h, w)
        return m.output_proj(img) + x


@pytest.mark.parametrize("use_dwt", ["Fourier", "Wavelet"])
def test_new_model_convert_and_forward_parity(use_dwt):
    mod = ref_oracle.load_new_model_module()
    torch.manual_seed(0)
    m = mod.MyModel(img_size=128, use_dwt=use_dwt)
    m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    ours = init_model("NewModel", img_size=128, use_dwt=use_dwt)
    variables = _coverage("NewModel", sd, ours, (1, 128, 128, 3))
    x = np.random.default_rng(2).standard_normal((1, 3, 128, 128)).astype(
        np.float32)
    want = _new_family_oracle(m, torch.from_numpy(x)).numpy().transpose(
        0, 2, 3, 1)
    got = np.asarray(ours.apply(variables,
                                jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("ref_name,arch,use_dwt", [
    ("MyBigModel", "NewBigModel", "Wavelet"),
    ("MyBigModel", "NewBigModel", "Fourier"),
    ("MyBigFRFNModel", "NewBigFRFNModel", "Wavelet"),
    ("MyBigFRFNModel", "NewBigFRFNModel", "Fourier"),
])
def test_new_big_models_convert_and_forward_parity(ref_name, arch, use_dwt):
    """Full forward parity for the 2-blocks-per-level family — NewBigModel is
    the arch behind the reference's published checkpoint (eval.ipynb cell 1).
    The reference's own .forward crashes (undefined adaptive_pool /
    conv_super_*, model.py:396,449), so the oracle drives its submodules in
    the working order.  Both FDFP modes are pinned (Fourier is the
    reference's default, model.py:281)."""
    mod = ref_oracle.load_new_model_module()
    torch.manual_seed(0)
    m = getattr(mod, ref_name)(img_size=128, use_dwt=use_dwt)
    m.eval()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    ours = init_model(arch, img_size=128, use_dwt=use_dwt)
    variables = _coverage(arch, sd, ours, (1, 128, 128, 3))
    x = np.random.default_rng(3).standard_normal((1, 3, 128, 128)).astype(
        np.float32)
    want = _new_family_oracle(m, torch.from_numpy(x)).numpy().transpose(
        0, 2, 3, 1)
    got = np.asarray(ours.apply(variables,
                                jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

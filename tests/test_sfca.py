"""SFCA / AGSSF / inv_mag parity against the reference's (dormant) modules
(SpectralTransformer.py:9-74) and offline DataAugmentor behavior."""
import numpy as np
import pytest
import torch

import ref_oracle
from underwater_image_restoration_tpu.models.spectral_transformer import (
    AGSSF,
    SFCA,
    inv_mag,
)

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref():
    return ref_oracle.load_spectral_module()


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_inv_mag_matches(ref):
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 4)).astype(np.float32)
    want = _nhwc(ref.inv_mag(_nchw(x)))
    got = np.asarray(inv_mag(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_agssf_matches(ref):
    torch.manual_seed(0)
    c = 16
    tm = ref.AGSSF(c).eval()
    x = np.random.default_rng(1).standard_normal((2, 8, 8, c)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(_nchw(x)))
    m = AGSSF(c)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # torch Conv1d weight (out=1, in=1, k) -> flax taps (k, 1, 1)
    k = tm.conv.weight.detach().numpy()  # (1, 1, k)
    params = {"params": {"conv": jnp.asarray(k[0, 0][:, None, None])}}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sfca_matches(ref):
    torch.manual_seed(1)
    c = 8
    tm = ref.SFCA(c).eval()
    x = np.random.default_rng(2).standard_normal((1, 8, 8, c)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(_nchw(x)))

    def conv_w(mod):
        return jnp.asarray(mod.weight.detach().numpy().transpose(2, 3, 1, 0))

    def conv(mod):
        return {"kernel": conv_w(mod), "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {"params": {
        "conv_1": conv(tm.conv_1),
        "conv_2": conv(tm.conv_2),
        "identity1": conv(tm.identity1),
        "identity2": conv(tm.identity2),
        "conv_f1": conv(tm.conv_f1),
        "conv_f2": conv(tm.conv_f2),
        "con2X1": conv(tm.con2X1),
        "agssf": {"conv": jnp.asarray(
            tm.agssf.conv.weight.detach().numpy()[0, 0][:, None, None])},
    }}
    m = SFCA(c)
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_offline_augmentor(tmp_path):
    from PIL import Image

    from underwater_image_restoration_tpu.data import (
        AugmentConfig,
        DataAugmentor,
        synthetic_pair_batch,
    )

    raw, refi = synthetic_pair_batch(3, 16, seed=0)
    for sub, arr in (("a", raw), ("b", refi)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(3):
            Image.fromarray(arr[i]).save(d / f"{i}.png")
    aug = DataAugmentor(
        str(tmp_path / "a"), str(tmp_path / "a_aug"),
        pair_source_directory=str(tmp_path / "b"),
        pair_target_directory=str(tmp_path / "b_aug"),
        config=AugmentConfig(flip_prob=1.0, noise_prob=0.0, contrast_prob=0.0),
    )
    aug.apply_augmentations(num_augmentations_per_image=2)
    n = aug.save_augmented_images()
    assert n == 6
    # *_augN naming (reference DataAugmentor.py:147)
    assert sorted(f for f in (tmp_path / "a_aug").iterdir())[0].name == "0_aug1.png"
    # pair-consistent flips: both sides double-flipped
    a1 = np.asarray(Image.open(tmp_path / "a_aug" / "0_aug1.png"))
    b1 = np.asarray(Image.open(tmp_path / "b_aug" / "0_aug1.png"))
    np.testing.assert_array_equal(a1, raw[0][::-1, ::-1])
    np.testing.assert_array_equal(b1, refi[0][::-1, ::-1])


def test_plain_attention_matches_reference():
    """The dormant plain Attention (reference AST.py:226-267)."""
    ast_ref = ref_oracle.load_ast_module()
    torch.manual_seed(2)
    tm = ast_ref.Attention(dim=16, num_heads=2).eval()

    from underwater_image_restoration_tpu.models.ast import Attention

    x = np.random.default_rng(5).standard_normal((2, 12, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    m = Attention(dim=16, num_heads=2)
    lin = lambda mod: {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                       "bias": jnp.asarray(mod.bias.detach().numpy())}
    params = {"params": {
        "to_q": lin(tm.qkv.to_q),
        "to_kv": lin(tm.qkv.to_kv),
        "proj": lin(tm.proj),
    }}
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)

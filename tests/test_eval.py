"""Evaluation subsystem tests.  The UIQM oracle is the reference's own
uqim_utils module (pure numpy/scipy, imported read-only from /root/reference)
— the vectorized rewrite must match it to float precision."""
import os
import sys

import numpy as np
import pytest

from underwater_image_restoration_tpu.data import synthetic_pair_batch
from underwater_image_restoration_tpu.eval import (
    compute_uiqm,
    dir_ssim_psnr,
    drop_lowest,
    evaluate_pairs,
    grad_cam,
    infer_directory,
    psnr_float_pm1,
    psnr_gray_u8,
    save_img,
    to_gray_u8,
    uiqm_sweep,
)

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_uqim():
    sys.path.insert(0, REFERENCE)
    import uqim_utils

    yield uqim_utils
    sys.path.remove(REFERENCE)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_uiqm_matches_reference_oracle(ref_uqim, seed):
    rng = np.random.default_rng(seed)
    img = (rng.random((50, 64, 3)) * 255).astype(np.uint8)
    want = ref_uqim.getUIQM(img)
    got = compute_uiqm(img)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6, abs=1e-9)


def test_uiqm_zero_blocks_skipped(ref_uqim):
    img = np.zeros((40, 40, 3), np.uint8)
    img[5:12, 5:12] = 200  # some nonzero blocks, many all-zero ones
    want = ref_uqim.getUIQM(img)
    got = compute_uiqm(img)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, rel=1e-6, abs=1e-9)


def test_getuiqm_shim_matches_compute_uiqm():
    from underwater_image_restoration_tpu.eval import getUIQM

    rng = np.random.default_rng(3)
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    assert getUIQM(img) == compute_uiqm(img)


def test_uiqm_flat_channel_documented_divergence(ref_uqim):
    """An all-zero channel NaNs the reference's sobel (uqim_utils.py:53-55
    divides by max unconditionally); our _sobel_mag guards it — a documented
    intentional fix (see eval/uiqm.py module docstring)."""
    rng = np.random.default_rng(4)
    img = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    img[..., 2] = 0  # flat blue channel
    with np.errstate(invalid="ignore", divide="ignore"):
        want = ref_uqim.getUIQM(img)
    assert np.isnan(want[0])  # the reference quirk this diverges from
    got = compute_uiqm(img)
    assert np.isfinite(got).all()
    # UICM/UICONM are unaffected by the sobel guard and still match.
    assert got[1] == pytest.approx(want[1], rel=1e-6, abs=1e-9)
    assert got[3] == pytest.approx(want[3], rel=1e-6, abs=1e-9)


def test_uiqm_cv2_emulation_differs():
    raw, _ = synthetic_pair_batch(1, 64, seed=0)
    rgb = compute_uiqm(raw[0])[0]
    bgr = compute_uiqm(raw[0], emulate_cv2=True)[0]
    assert rgb != pytest.approx(bgr)


def test_save_img_roundtrip(tmp_path):
    from PIL import Image

    arr = np.linspace(-1, 1, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    p = str(tmp_path / "x.png")
    save_img(arr, p)
    back = np.asarray(Image.open(p)).astype(np.float32) / 255.0 * 2 - 1
    assert np.abs(back - arr).max() < 2 / 255 + 1e-6
    # CHW input also accepted (notebook passes CHW tensors)
    save_img(arr.transpose(2, 0, 1), str(tmp_path / "y.png"))
    assert np.array_equal(np.asarray(Image.open(tmp_path / "y.png")),
                          np.asarray(Image.open(p)))


def test_psnr_formulas():
    """skimage isn't installed here; verify against the formula it uses:
    10*log10(data_range^2 / MSE), data_range=2 for float (-1,1) images."""
    rng = np.random.default_rng(0)
    a = (rng.random((16, 16, 3)) * 2 - 1).astype(np.float64)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1)
    want = 10 * np.log10(4.0 / np.mean((a - b) ** 2))
    assert psnr_float_pm1(a, b) == pytest.approx(want, rel=1e-12)
    au = (rng.random((16, 16)) * 255).astype(np.uint8)
    bu = (rng.random((16, 16)) * 255).astype(np.uint8)
    want_u = 10 * np.log10(
        255.0 ** 2 / np.mean((au.astype(float) - bu.astype(float)) ** 2))
    assert psnr_gray_u8(au, bu) == pytest.approx(want_u, rel=1e-12)
    assert psnr_float_pm1(a, a) == float("inf")


def test_drop_lowest():
    v = np.array([3.0, 1.0, 9.0, 2.0, 7.0, 5.0])
    np.testing.assert_array_equal(drop_lowest(v, 4), [7.0, 9.0])


@pytest.fixture(scope="module")
def tiny_model():
    import jax
    import jax.numpy as jnp

    from underwater_image_restoration_tpu.models import init_model

    model = init_model("SpectralTransformer")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))
    return model, params


def test_evaluate_pairs_and_dir_metrics(tiny_model, tmp_path, monkeypatch):
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    model, params = tiny_model
    raw, ref = synthetic_pair_batch(3, 16, seed=7)
    for sub, arr in (("a", raw), ("b", ref)):
        os.makedirs(sub)
        for i in range(3):
            Image.fromarray(arr[i]).save(f"{sub}/{i}.png")
    psnrs = evaluate_pairs(model, params, "a", "b", image_size=16)
    assert psnrs.shape == (3,) and np.all(np.isfinite(psnrs))
    assert sorted(os.listdir("test")) == ["0.png", "1.png", "2.png"]
    # batched dispatch (batch 2 over 3 images: one full + one zero-padded
    # batch) must reproduce the per-image results and files exactly
    import hashlib

    digest1 = {f: hashlib.sha256(open(f"test/{f}", "rb").read()).hexdigest()
               for f in os.listdir("test")}
    psnrs_b = evaluate_pairs(model, params, "a", "b", image_size=16,
                             out_pred="test2", out_ref="ref2", batch_size=2)
    np.testing.assert_allclose(psnrs_b, psnrs, rtol=1e-6)
    for f, d in digest1.items():
        assert hashlib.sha256(
            open(f"test2/{f}", "rb").read()).hexdigest() == d
    ssims, ps = dir_ssim_psnr("test", "ref", size=16, drop_n=1)
    assert len(ssims) == 3 and len(ps) == 3
    assert np.all(ssims <= 1.0) and np.all(np.isfinite(ps))


def test_infer_and_uiqm_sweep(tiny_model, tmp_path, monkeypatch):
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    model, params = tiny_model
    raw, _ = synthetic_pair_batch(2, 16, seed=8)
    os.makedirs("u45")
    for i in range(2):
        Image.fromarray(raw[i]).save(f"u45/im{i}.jpg")
    n = infer_directory(model, params, "u45", "uTest", size=16)
    assert n == 2 and len(os.listdir("uTest")) == 2
    vals = uiqm_sweep("uTest", size=16)
    assert vals.shape == (2,) and np.all(np.isfinite(vals))


def test_grad_cam(tiny_model):
    import jax.numpy as jnp

    model, params = tiny_model
    raw, _ = synthetic_pair_batch(1, 16, seed=9)
    x = (jnp.asarray(raw, jnp.float32) / 255.0 - 0.5) / 0.5
    cam, act = grad_cam(model, params, x, target_path=("outputl",))
    assert cam.shape == (16, 16)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    with pytest.raises(ValueError):
        grad_cam(model, params, x, target_path=("no_such_layer",))

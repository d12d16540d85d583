"""Loss-system tests: torch oracles for primitives, exact float64
transcriptions of the pytorch_msssim / focal_frequency_loss packages as
MS-SSIM/FFL oracles (freq_oracles.py), dispatch coverage for all ~18 loss
names."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from underwater_image_restoration_tpu import losses
from underwater_image_restoration_tpu.losses import msssim as msslib


def _pair(rng, shape=(2, 12, 12, 3)):
    a = rng.random(shape, dtype=np.float32)
    b = rng.random(shape, dtype=np.float32)
    return a, b


# ---------------- primitives vs torch ----------------


def test_l1_l2_charbonnier_match_torch(rng):
    a, b = _pair(rng)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    np.testing.assert_allclose(
        float(losses.l1_loss(a, b)), float(TF.l1_loss(ta, tb)), atol=1e-6
    )
    np.testing.assert_allclose(
        float(losses.mse_loss(a, b)), float(TF.mse_loss(ta, tb)), atol=1e-6
    )
    ch = torch.mean(torch.sqrt((ta - tb) ** 2 + 1e-6))
    np.testing.assert_allclose(
        float(losses.charbonnier_loss(a, b)), float(ch), atol=1e-6
    )


def test_color_luminance_match_torch(rng):
    a, b = _pair(rng)
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    color = torch.mean(torch.mean((ta - tb) ** 2, dim=(2, 3)))
    np.testing.assert_allclose(float(losses.color_loss(a, b)), float(color), atol=1e-6)
    coeff = torch.tensor([0.299, 0.587, 0.114]).view(1, 3, 1, 1)
    lum = TF.mse_loss(
        torch.sum(ta * coeff, 1, keepdim=True), torch.sum(tb * coeff, 1, keepdim=True)
    )
    np.testing.assert_allclose(
        float(losses.luminance_loss(a, b)), float(lum), atol=1e-6
    )


def test_gradient_loss_matches_torch(rng):
    a, b = _pair(rng)
    k = torch.tensor(
        [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]]
    ).view(1, 1, 3, 3).repeat(3, 1, 1, 1)
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    ref = TF.l1_loss(TF.conv2d(ta, k, groups=3), TF.conv2d(tb, k, groups=3))
    np.testing.assert_allclose(
        float(losses.gradient_loss(a, b)), float(ref), atol=1e-6
    )


def test_tv_loss_matches_torch(rng):
    a, _ = _pair(rng)
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    B, C, H, W = ta.shape
    h_tv = ((ta[:, :, 1:, :] - ta[:, :, :-1, :]) ** 2).sum()
    w_tv = ((ta[:, :, :, 1:] - ta[:, :, :, :-1]) ** 2).sum()
    ref = 2 * (h_tv / (C * (H - 1) * W) + w_tv / (C * H * (W - 1))) / B
    np.testing.assert_allclose(float(losses.tv_loss(a)), float(ref), atol=1e-6)


# ---------------- SSIM / MS-SSIM ----------------


def _np_ssim_naive(x, y, win, data_range=1.0):
    """Independent naive numpy SSIM (valid padding, separable window)."""
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2

    def filt(img):  # img (H, W)
        K = len(win)
        h = np.apply_along_axis(lambda r: np.convolve(r, win[::-1], "valid"), 0, img)
        return np.apply_along_axis(lambda r: np.convolve(r, win[::-1], "valid"), 1, h)

    vals = []
    for b in range(x.shape[0]):
        for c in range(x.shape[-1]):
            X, Y = x[b, :, :, c], y[b, :, :, c]
            mu1, mu2 = filt(X), filt(Y)
            s1 = filt(X * X) - mu1 ** 2
            s2 = filt(Y * Y) - mu2 ** 2
            s12 = filt(X * Y) - mu1 * mu2
            cs = (2 * s12 + c2) / (s1 + s2 + c2)
            sm = (2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1) * cs
            vals.append(sm.mean())
    return float(np.mean(vals))


def test_ssim_identity_and_naive_oracle(rng):
    x = rng.random((1, 24, 24, 3), dtype=np.float32)
    assert float(losses.ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    y = np.clip(x + 0.05 * rng.standard_normal(x.shape, dtype=np.float32), 0, 1)
    got = float(losses.ssim(x, y, win_size=7))
    win = msslib._gaussian_kernel(7, 1.5)
    want = _np_ssim_naive(x, y, win)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ms_ssim_identity_and_monotonic(rng):
    x = rng.random((1, 48, 48, 3), dtype=np.float32)
    val_id = float(losses.ms_ssim(x, x, win_size=3))
    assert val_id == pytest.approx(1.0, abs=1e-5)
    y1 = np.clip(x + 0.02 * rng.standard_normal(x.shape, dtype=np.float32), 0, 1)
    y2 = np.clip(x + 0.2 * rng.standard_normal(x.shape, dtype=np.float32), 0, 1)
    v1 = float(losses.ms_ssim(x, y1, win_size=3))
    v2 = float(losses.ms_ssim(x, y2, win_size=3))
    assert 1.0 > v1 > v2


# ---------------- exact package transcriptions (freq_oracles.py) --------
# The reference's MS-SSIM/FFL are the pytorch_msssim / focal_frequency_loss
# pip packages (reference losses.py:5-6,46-48; val SSIM ModelTrainer.py:23-24),
# not installable here — freq_oracles.py transcribes their algorithms
# op-for-op onto torch.nn.functional in float64 (same conv/avg_pool/fft
# kernels the packages call).  SURVEY §2.3 tolerance: <=1e-5.

import freq_oracles  # noqa: E402


def _nchw64(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()


@pytest.mark.parametrize(
    "shape,win", [((2, 24, 24, 3), 11), ((1, 23, 29, 3), 7),
                  ((1, 17, 16, 2), 11)])
def test_ssim_matches_package_transcription(rng, shape, win):
    x = rng.random(shape, dtype=np.float32)
    y = np.clip(x + 0.08 * rng.standard_normal(shape).astype(np.float32),
                0, 1)
    got = float(losses.ssim(x, y, win_size=win))
    want = freq_oracles.ssim_oracle(_nchw64(x), _nchw64(y), win_size=win)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize(
    "shape,win",
    [
        ((1, 98, 100, 1), 7),    # even sides
        ((1, 99, 103, 2), 7),    # odd sides: exercises avg_pool padding
                                 # at several pyramid levels
        ((1, 162, 171, 3), 11),  # odd, full default window
        ((1, 256, 256, 3), 11),  # the training resolution the losses see
    ])
def test_ms_ssim_matches_package_transcription(rng, shape, win):
    x = rng.random(shape, dtype=np.float32)
    y = np.clip(x + 0.08 * rng.standard_normal(shape).astype(np.float32),
                0, 1)
    got = float(losses.ms_ssim(x, y, win_size=win))
    want = freq_oracles.ms_ssim_oracle(_nchw64(x), _nchw64(y), win_size=win)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize(
    "shape,kw",
    [
        ((2, 12, 12, 3), {}),                     # reference defaults
        ((1, 9, 13, 3), {}),                      # odd sides
        ((2, 16, 20, 3), {"patch_factor": 2}),
        ((1, 16, 16, 2), {"patch_factor": 4, "log_matrix": True}),
        ((2, 10, 14, 3), {"batch_matrix": True}),
        ((3, 12, 8, 3), {"ave_spectrum": True, "alpha": 2.0}),
    ])
def test_ffl_matches_package_transcription(rng, shape, kw):
    x = rng.random(shape, dtype=np.float32)
    y = rng.random(shape, dtype=np.float32)
    got = float(losses.focal_frequency_loss(x, y, **kw))
    want = freq_oracles.ffl_oracle(_nchw64(x), _nchw64(y), **kw)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


# ---------------- FFL ----------------


def test_ffl_identity_zero_and_numpy_oracle(rng):
    x = rng.random((1, 8, 8, 3), dtype=np.float32)
    assert float(losses.focal_frequency_loss(x, x)) == pytest.approx(0.0, abs=1e-9)
    y = rng.random((1, 8, 8, 3), dtype=np.float32)
    # independent numpy computation
    fx = np.fft.fft2(x, axes=(1, 2), norm="ortho")
    fy = np.fft.fft2(y, axes=(1, 2), norm="ortho")
    dist = np.abs(fx - fy) ** 2
    w = np.sqrt(dist)
    w = w / w.max(axis=(1, 2), keepdims=True)
    want = float(np.mean(w * dist))
    got = float(losses.focal_frequency_loss(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ---------------- perceptual ----------------


def test_perceptual_placeholder_runs(rng):
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    y = rng.random((1, 32, 32, 3), dtype=np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        same = float(losses.vgg_perceptual_loss(x, x, resize=False))
        diff = float(losses.vgg_perceptual_loss(x, y, resize=False))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 0


# ---------------- dispatcher ----------------

_FAST_NAMES = [
    "L1", "L1withColor", "L1ColorLum", "L2", "charbonnier", "gradient",
    "ffl", "fflCharbonnier", "LuminanceCharbonnier", "Luminance",
    "AdaptiveLuminanceCharbonnier", "AdaptiveLuminanceFFL", "LuminanceFFL",
]


@pytest.mark.parametrize("name", _FAST_NAMES)
def test_loss_dispatch_fast(name, rng):
    a, b = _pair(rng)
    lf = losses.LossFunction(name)
    val = lf.getloss(jnp.asarray(a), jnp.asarray(b))
    assert np.isfinite(float(val))


def test_loss_dispatch_msssim_family(rng):
    # ms_ssim needs side > (win-1)*2^4 = 160 at the reference win_size=11
    a = rng.random((1, 164, 164, 3), dtype=np.float32)
    b = rng.random((1, 164, 164, 3), dtype=np.float32)
    val = losses.LossFunction("ms_ssim").getloss(jnp.asarray(a), jnp.asarray(b))
    assert 0.0 <= float(val) <= 1.0


def test_loss_dispatch_ffl_mix_tuple(rng):
    a = rng.random((1, 164, 164, 3), dtype=np.float32)
    b = rng.random((1, 164, 164, 3), dtype=np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = losses.LossFunction(
            "fflMix", allow_placeholder_vgg=True
        ).getloss(jnp.asarray(a), jnp.asarray(b))
    assert len(out) == 6
    loss, charb, perc, grad, ffl, ssim_l = (float(v) for v in out)
    np.testing.assert_allclose(
        loss,
        0.03 * charb + 0.025 * perc + 0.01 * grad + 0.005 * ffl + 0.1 * ssim_l,
        rtol=1e-5,
    )


def test_loss_unknown_raises():
    with pytest.raises(ValueError):
        losses.LossFunction("nope")


@pytest.mark.parametrize("name", sorted(losses.PERCEPTUAL_FAMILY))
def test_perceptual_family_requires_real_vgg(name, monkeypatch, tmp_path):
    """Without converted VGG16 weights the perceptual-family losses must
    refuse loudly rather than silently train on random features
    (VERDICT.md missing #1; reference losses.py:219-222)."""
    monkeypatch.delenv("UIRT_ALLOW_PLACEHOLDER_VGG", raising=False)
    with pytest.raises(FileNotFoundError, match="convert_vgg16"):
        losses.LossFunction(name)
    with pytest.raises(FileNotFoundError):
        losses.LossFunction(name, vgg_weights=str(tmp_path / "missing.npz"))
    # explicit opt-ins still work
    assert losses.LossFunction(name, allow_placeholder_vgg=True)
    monkeypatch.setenv("UIRT_ALLOW_PLACEHOLDER_VGG", "1")
    assert losses.LossFunction(name)


def test_l1_bc_division(rng):
    a, b = _pair(rng, (2, 8, 8, 3))
    val = float(losses.LossFunction("L1").getloss(jnp.asarray(a), jnp.asarray(b)))
    raw = float(losses.l1_loss(a, b))
    np.testing.assert_allclose(val, raw / (2 * 3), rtol=1e-6)

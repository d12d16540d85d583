"""Data pipeline tests: pairing, determinism, resume, padding, augmentation
(oracle: torchvision for contrast semantics)."""
import os

import numpy as np
import pytest

from underwater_image_restoration_tpu.data import (
    AugmentConfig,
    PairedLoader,
    UIEBDataset,
    augment_pair_batch,
    get_dataloaders,
    synthetic_pair_batch,
)


@pytest.fixture(scope="module")
def uieb_dirs(tmp_path_factory):
    """Tiny on-disk UIEB-style tree: train a/ b/ with 11 paired PNGs."""
    from PIL import Image

    root = tmp_path_factory.mktemp("uieb")
    raw, ref = synthetic_pair_batch(11, 16, seed=3)
    for sub, arr in (("a", raw), ("b", ref)):
        d = root / sub
        d.mkdir()
        for i in range(arr.shape[0]):
            Image.fromarray(arr[i]).save(d / f"{i:03d}_img_.png")
    return str(root / "a"), str(root / "b")


def test_synthetic_batch_shapes():
    raw, ref = synthetic_pair_batch(2, 32)
    assert raw.shape == ref.shape == (2, 32, 32, 3)
    assert raw.dtype == ref.dtype == np.uint8
    # degradation attenuates red on average
    assert raw[..., 0].mean() < ref[..., 0].mean()


def test_dataset_pairing_and_resize(uieb_dirs):
    ds = UIEBDataset(*uieb_dirs, image_size=8)
    assert len(ds) == 11
    r, g = ds[0]
    assert r.shape == g.shape == (8, 8, 3) and r.dtype == np.uint8


def test_decoded_cache_matches_and_invalidates(uieb_dirs, tmp_path):
    """CachedUIEBDataset serves bit-identical pairs from the memmap, reuses
    the cache across instances, and rebuilds when the listing changes."""
    from underwater_image_restoration_tpu.data.cache import CachedUIEBDataset

    cache = str(tmp_path / "cache")
    ds = UIEBDataset(*uieb_dirs, image_size=8)
    cds = CachedUIEBDataset(ds, cache)
    assert len(cds) == len(ds)
    for i in (0, 5, 10):
        r, g = ds[i]
        cr, cg = cds[i]
        np.testing.assert_array_equal(cr, r)
        np.testing.assert_array_equal(cg, g)
    files = sorted(os.listdir(cache))
    # second instance reuses the same files (no rebuild)
    CachedUIEBDataset(UIEBDataset(*uieb_dirs, image_size=8), cache)
    assert sorted(os.listdir(cache)) == files
    # a different resolution gets its own tag
    CachedUIEBDataset(UIEBDataset(*uieb_dirs, image_size=4), cache)
    assert len(os.listdir(cache)) == 2 * len(files)


def test_dataset_unpaired_raises(uieb_dirs, tmp_path):
    import shutil, os
    lonely = tmp_path / "b2"
    shutil.copytree(uieb_dirs[1], lonely)
    os.remove(os.path.join(lonely, sorted(os.listdir(lonely))[0]))
    with pytest.raises(ValueError):
        UIEBDataset(uieb_dirs[0], str(lonely))


def test_loader_determinism_and_padding(uieb_dirs):
    mk = lambda: PairedLoader(
        UIEBDataset(*uieb_dirs, image_size=8), batch_size=4, shuffle=True,
        seed=7, num_workers=2,
    )
    a = [b for b in mk()]
    b = [b for b in mk()]
    assert len(a) == 3  # ceil(11/4) with padding
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.raw, y.raw)
        np.testing.assert_array_equal(x.valid, y.valid)
    # final batch padded: 11 = 4+4+3
    assert a[-1].valid.tolist() == [True, True, True, False]
    assert a[-1].raw.shape == (4, 8, 8, 3)
    # second epoch shuffles differently
    ld = mk()
    e0 = [x.raw.copy() for x in ld]
    e1 = [x.raw.copy() for x in ld]
    assert any(not np.array_equal(x, y) for x, y in zip(e0, e1))


def test_loader_resume_mid_epoch(uieb_dirs):
    mk = lambda: PairedLoader(
        UIEBDataset(*uieb_dirs, image_size=8), batch_size=4, shuffle=True,
        seed=7, num_workers=2,
    )
    full = [b.raw.copy() for b in mk()]
    ld = mk()
    it = iter(ld)
    next(it)  # consume batch 0
    state = ld.state_dict()
    del it
    ld2 = mk()
    ld2.load_state_dict(state)
    rest = [b for b in ld2]
    assert len(rest) == 2
    np.testing.assert_array_equal(rest[0].raw, full[1])
    np.testing.assert_array_equal(rest[1].raw, full[2])
    # Batch.index reports the TRUE intra-epoch position after the resume
    # (enumerate() restarts at 0; the trainer's global step relies on this)
    assert [b.index for b in rest] == [1, 2]


def test_get_dataloaders_parity(uieb_dirs):
    tr, te = get_dataloaders(*uieb_dirs, *uieb_dirs, batch_size=4,
                             image_size=8, test_batch_size=2)
    assert len(tr) == 3 and len(te) == 6
    # test loader ordered, unaugmented
    first = next(iter(te))
    ds = UIEBDataset(*uieb_dirs, image_size=8)
    np.testing.assert_array_equal(first.raw[0], ds[0][0])


def test_augment_flip_pair_consistent():
    raw, ref = synthetic_pair_batch(8, 16, seed=1)
    rng = np.random.default_rng(0)
    araw, aref = augment_pair_batch(
        raw, ref, rng,
        AugmentConfig(flip_prob=1.0, noise_prob=0.0, contrast_prob=0.0),
    )
    # hflip+vflip both applied to both sides identically
    np.testing.assert_array_equal(araw, raw[:, ::-1, ::-1])
    np.testing.assert_array_equal(aref, ref[:, ::-1, ::-1])


def test_augment_noise_raw_only_and_deterministic():
    raw, ref = synthetic_pair_batch(4, 16, seed=2)
    cfg = AugmentConfig(flip_prob=0.0, noise_prob=1.0, contrast_prob=0.0)
    a1, r1 = augment_pair_batch(raw, ref, np.random.default_rng(5), cfg)
    a2, r2 = augment_pair_batch(raw, ref, np.random.default_rng(5), cfg)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(r1, ref)  # target untouched
    assert not np.array_equal(a1, raw)


def test_contrast_matches_pil_enhance():
    """PIL ImageEnhance.Contrast is the semantics torchvision's
    adjust_contrast mirrors for uint8 (blend with rounded grayscale mean)."""
    from PIL import Image, ImageEnhance

    raw, _ = synthetic_pair_batch(3, 16, seed=4)
    from underwater_image_restoration_tpu.data.augment import _adjust_contrast_u8

    factors = np.array([0.7, 1.0, 1.3])
    ours = _adjust_contrast_u8(raw, factors)
    for i, f in enumerate(factors):
        want = np.asarray(
            ImageEnhance.Contrast(Image.fromarray(raw[i])).enhance(float(f))
        )
        assert np.abs(ours[i].astype(int) - want.astype(int)).max() <= 1


def test_u45_and_custom_datasets(tmp_path):
    from PIL import Image

    from underwater_image_restoration_tpu.data import (
        CustomImageDataset,
        U45Dataset,
    )

    raw, ref = synthetic_pair_batch(3, 16, seed=20)
    (tmp_path / "in").mkdir(); (tmp_path / "ref").mkdir()
    for i in range(3):
        Image.fromarray(raw[i]).save(tmp_path / "in" / f"im{i}.png")
    # only 2 matching filenames in ref + one extra unmatched
    for i in range(2):
        Image.fromarray(ref[i]).save(tmp_path / "ref" / f"im{i}.png")
    Image.fromarray(ref[2]).save(tmp_path / "ref" / "other.png")
    (tmp_path / "in" / "notes.txt").write_text("skip me")

    u45 = U45Dataset(str(tmp_path / "in"), image_size=8)
    assert len(u45) == 3
    img, idx = u45[1]
    assert img.shape == (8, 8, 3) and idx == 1

    ds = CustomImageDataset([str(tmp_path / "in")], [str(tmp_path / "ref")],
                            image_size=8, image_size_high=16)
    assert len(ds) == 2  # filename-matched only
    x, rl, rh, idx = ds[0]
    assert x.shape == (8, 8, 3) and rl.shape == (8, 8, 3)
    assert rh.shape == (16, 16, 3) and idx == 0


def test_loader_surfaces_decode_errors(tmp_path):
    from PIL import Image

    raw, ref = synthetic_pair_batch(4, 16, seed=30)
    for sub, arr in (("a", raw), ("b", ref)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(4):
            Image.fromarray(arr[i]).save(d / f"{i}.png")
    (tmp_path / "a" / "2.png").write_bytes(b"not a png")  # corrupt
    ld = PairedLoader(UIEBDataset(str(tmp_path / "a"), str(tmp_path / "b"),
                                  image_size=8),
                      batch_size=2, shuffle=False, num_workers=2)
    with pytest.raises(Exception):
        list(ld)

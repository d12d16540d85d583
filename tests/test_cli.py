"""CLI parity tests: flag surface, train branch, evaluate branch."""
import os

import numpy as np
import pytest

from underwater_image_restoration_tpu.cli import argument_parser
from underwater_image_restoration_tpu.cli.main import main
from underwater_image_restoration_tpu.core import config as config_lib
from underwater_image_restoration_tpu.data import synthetic_pair_batch

REFERENCE_FLAGS = [
    "--root", "--workers", "--split-id", "--height", "--width",
    "--train-sampler", "--random-erase", "--color-jitter", "--color-aug",
    "--randomPerspective", "--randomRotate", "--optim", "--lr",
    "--weight-decay", "--momentum", "--sgd-dampening", "--sgd-nesterov",
    "--rmsprop-alpha", "--adam-beta1", "--adam-beta2", "--max-epoch",
    "--start-epoch", "--train-batch-size", "--test-batch-size",
    "--lr-scheduler", "--stepsize", "--gamma", "--label-smooth", "--margin",
    "--num-instances", "--lambda-xent", "--lambda-htri", "--test_size",
    "--query-remove", "--arch", "--lossf", "--no-pretrained", "--use-dwt",
    "--load-weights", "--evaluate", "--eval-freq", "--start-eval",
    "--print-freq", "--seed", "--resume", "--save-dir", "--use-cpu",
    "--gpu-devices", "--use-avai-gpus", "--use-wandb", "--visualize-ranks",
]


def test_full_reference_flag_surface_accepted():
    parser = argument_parser()
    opts = {s for a in parser._actions for s in a.option_strings}
    missing = [f for f in REFERENCE_FLAGS if f not in opts]
    assert not missing, f"missing reference flags: {missing}"


def test_reference_defaults():
    ns = argument_parser().parse_args([])
    assert ns.arch == "SpectralTransformer" and ns.lossf == "L1"
    assert ns.lr == 0.0003 and ns.max_epoch == 60
    assert ns.train_batch_size == 2 and ns.test_batch_size == 1
    assert ns.use_dwt == "Fourier" and ns.optim == "adam"
    assert ns.use_wandb is True
    ns2 = argument_parser().parse_args(["--use-wandb"])  # store_false quirk
    assert ns2.use_wandb is False


def test_short_flags_and_config_mapping():
    ns = argument_parser().parse_args(
        ["-a", "NewBigModel", "-lossf", "fflMix", "--use-dwt", "Wavelet",
         "--lr", "5e-5", "--train-batch-size", "2", "--max-epoch", "2500"]
    )  # the Dockerfile:12 canonical config
    cfg = config_lib.from_namespace(ns)
    assert cfg.arch == "NewBigModel" and cfg.lossf == "fflMix"
    assert cfg.use_dwt == "Wavelet" and cfg.lr == 5e-5
    assert cfg.max_epoch == 2500


@pytest.fixture(scope="module")
def cli_dirs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("cli")
    raw, ref = synthetic_pair_batch(4, 16, seed=11)
    for split, n in (("train", 4), ("test", 2)):
        for sub, arr in (("a", raw), ("b", ref)):
            d = root / split / sub
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(arr[i]).save(d / f"{i}_img_.png")
    return root


def test_cli_train_and_evaluate(cli_dirs, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    argv = [
        "-a", "SpectralTransformer", "--lossf", "L1", "--lr", "1e-3",
        "--max-epoch", "1", "--train-batch-size", "2", "--test-batch-size", "2",
        "--image-size", "16", "--mesh-data", "1", "--use-wandb",
        "--compute-dtype", "float32",
        "--checkpoint-dir", str(tmp_path / "ck"), "--workers", "1",
        "--train-raw", str(cli_dirs / "train" / "a"),
        "--train-ref", str(cli_dirs / "train" / "b"),
        "--test-raw", str(cli_dirs / "test" / "a"),
        "--test-ref", str(cli_dirs / "test" / "b"),
    ]
    main(argv)
    # tee log written under the hyperparam-encoded dir (reference main.py:32)
    logd = ("logs/arch-SpectralTransformer/optimizer-adam/loss-L1/maxEpoch-1/"
            "lr-0.001/batchSize-2/perspective-False-rotate-False")
    assert os.path.exists(os.path.join(logd, "log_train.txt"))
    runs = os.listdir(tmp_path / "ck")
    assert len(runs) == 1
    run_dir = tmp_path / "ck" / runs[0]

    # -- evaluate branch ------------------------------------------------
    from PIL import Image
    os.makedirs("image_in", exist_ok=True)
    raw, _ = synthetic_pair_batch(1, 16, seed=12)
    Image.fromarray(raw[0]).save("image_in/probe.png")
    main([
        "--evaluate", "--load-weights", str(run_dir / "best"),
        "-a", "SpectralTransformer", "--image-in", "image_in/",
        "--image-out", "image_out/", "--infer-size", "16", "--use-wandb",
    ])
    out = os.path.join("Images", "image_out/", "probe.png.png")
    assert os.path.exists(out)
    img = np.asarray(Image.open(out))
    assert img.shape == (16, 16, 3)


def test_compile_cache_flag_and_helper(tmp_path):
    """--compile-cache defaults to ~/.cache/uirt_xla, maps into Config, and
    enable_compile_cache points jax at the dir (empty string = no-op)."""
    import jax

    from underwater_image_restoration_tpu.cli.args import argument_parser
    from underwater_image_restoration_tpu.cli.main import enable_compile_cache
    from underwater_image_restoration_tpu.core.config import from_namespace

    ns = argument_parser().parse_args([])
    assert ns.compile_cache.endswith("uirt_xla")
    cache = str(tmp_path / "xla")
    cfg = from_namespace(argument_parser().parse_args(
        ["--compile-cache", cache]))
    assert cfg.compile_cache == cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compile_cache(cache)
        assert jax.config.jax_compilation_cache_dir == cache
        assert os.path.isdir(cache)
        enable_compile_cache("")  # no-op, keeps the previous dir
        assert jax.config.jax_compilation_cache_dir == cache
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

"""Entry point (reference ``main.py:20-94``).

Same control flow: parse args -> build log-dir path encoding hyperparams ->
tee stdout -> train branch (DataManager + ModelTrainer) or evaluate branch
(load weights, batch-infer image_in/ -> image_out/).  The reference's
hardcoded data dirs / checkpoint path (main.py:52-53,67-68,73-75) are CLI
flags here, defaulting to the reference's literals.
"""
from __future__ import annotations

import os
import os.path as osp
import sys
import time
import warnings

import jax

from .args import argument_parser
from ..core import config as config_lib
from ..data.manager import DataManager
from ..obs.loggers import Logger
from ..obs.visualiser import load_model_from_weights, process_image_using_model


def enable_compile_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache: first compiles through the remote
    compile service take 20-40 s (and the service occasionally wedges);
    re-running the same config then deserializes the cached executable
    instead.  Best-effort — not every PJRT backend supports executable
    serialization, so failures only warn."""
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold skips tiny programs; cache anything >=1 s
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # unsupported backend / read-only filesystem
        warnings.warn(f"compilation cache disabled: {e}")


def main(argv=None):
    parser = argument_parser()
    args = parser.parse_args(argv)
    cfg = config_lib.from_namespace(args)

    if args.use_cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.no_pallas:
        os.environ["UIRT_NO_PALLAS"] = "1"
    enable_compile_cache(cfg.compile_cache)

    print(jax.__version__)
    print(args.evaluate)

    # log-dir path encodes hyperparams (reference main.py:32)
    outputdirectory = (
        "logs/" + "/arch-" + str(args.arch) + "/optimizer-" + str(args.optim)
        + "/loss-" + str(args.lossf) + "/maxEpoch-" + str(args.max_epoch)
        + "/lr-" + str(args.lr) + "/batchSize-" + str(args.train_batch_size)
        + "/perspective-" + str(args.randomPerspective)
        + "-rotate-" + str(args.randomRotate)
    )
    args.save_dir = outputdirectory
    cfg = cfg.replace(save_dir=outputdirectory)
    log_name = "log_test.txt" if args.evaluate else "log_train.txt"
    prev_stdout = sys.stdout
    sys.stdout = Logger(osp.join(args.save_dir, log_name))
    try:
        _run(parser, args, cfg)
    finally:
        sys.stdout.close()
        sys.stdout = prev_stdout


def _run(parser, args, cfg):
    print("==========")
    print("Start time:{}".format(
        time.strftime("%Y-%m-%d %H:%M:%S", time.localtime())))
    print("==========")
    print(f"==========\nArgs:{args}\n==========")

    devs = jax.devices()
    if devs[0].platform == "cpu":
        warnings.warn("Currently using CPU, however, TPU is highly recommended")
    else:
        print(f"Devices: {devs}")

    if not args.evaluate:
        print("Initializing image data manager")
        dm = DataManager()
        dm.setDownloadedLocations(args.train_raw, args.train_ref)
        if not dm.use_existing:
            dm.download()  # kagglehub path; raises with guidance if unavailable

        print("Starting training")
        print(f"Raw Data Directory: {dm.raw_dir}")
        print(f"Reference Image Directory: {dm.ref_dir}")
        from ..train.trainer import ModelTrainer  # deferred: heavy imports

        trainer = ModelTrainer(dm.raw_dir, dm.ref_dir,
                               args.test_raw, args.test_ref)
        trainer.train(cfg, args.arch, args.max_epoch, args.lr)
    else:
        print("Evaluating...")
        input_dir = args.image_in
        output_dir = args.image_out
        model_path = args.load_weights or args.resume
        os.makedirs(output_dir, exist_ok=True)
        os.makedirs(input_dir, exist_ok=True)
        if not model_path:
            parser.error("--evaluate needs --load-weights <checkpoint dir>")

        import jax.numpy as jnp

        model, params = load_model_from_weights(model_path, cfg, args.arch,
                                                img_size=args.infer_size)
        apply = jax.jit(lambda x: model.apply(params, x))
        input_files = os.listdir(input_dir)
        print(f"Number of input images: {len(input_files)}")
        for file in input_files:
            print(f"Processing {file}")
            process_image_using_model(
                lambda a: jax.device_get(apply(jnp.asarray(a))),
                os.path.join(input_dir, file), output_dir, file,
                size=args.infer_size,
            )


if __name__ == "__main__":
    main()

"""Argument schema (reference ``args.py:6-279``) — same flag names, defaults
and semantics, including flags the reference parses but never uses (the ReID
leftovers: --train-sampler, --label-smooth, --margin, --num-instances,
--lambda-xent, --lambda-htri, --test_size, --query-remove, --visualize-ranks)
which are accepted for CLI-compatibility and ignored, plus TPU-native
extensions grouped at the bottom.
"""
from __future__ import annotations

import argparse

from ..core.config import DEFAULT_COMPILE_CACHE


def argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )

    # ---- data (reference args.py:14-80) ----
    parser.add_argument("--root", type=str, default="./datasets",
                        help="root path to data directory")
    parser.add_argument("-j", "--workers", default=4, type=int,
                        help="number of data loading workers")
    parser.add_argument("--split-id", type=int, default=0,
                        help="split index (note: 0-based)")
    parser.add_argument("--height", type=int, default=128,
                        help="height of an image")
    parser.add_argument("--width", type=int, default=256,
                        help="width of an image")
    parser.add_argument("--train-sampler", type=str, default="RandomSampler",
                        help="sampler for trainloader")
    parser.add_argument("--random-erase", action="store_true",
                        help="use random erasing for data augmentation")
    parser.add_argument("--color-jitter", action="store_true",
                        help="randomly change the brightness, contrast and saturation")
    parser.add_argument("--color-aug", action="store_true",
                        help="randomly alter the intensities of RGB channels")
    parser.add_argument("--randomPerspective", action="store_true",
                        help="random perspective augmentation")
    parser.add_argument("--randomRotate", action="store_true",
                        help="random rotation augmentation")

    # ---- optimization (reference args.py:84-130) ----
    parser.add_argument("--optim", type=str, default="adam",
                        help="optimization algorithm (see train.optim)")
    parser.add_argument("--lr", default=0.0003, type=float,
                        help="initial learning rate")
    parser.add_argument("--weight-decay", default=5e-04, type=float,
                        help="weight decay")
    parser.add_argument("--momentum", default=0.9, type=float,
                        help="momentum factor for sgd and rmsprop")
    parser.add_argument("--sgd-dampening", default=0, type=float,
                        help="sgd's dampening for momentum")
    parser.add_argument("--sgd-nesterov", action="store_true",
                        help="whether to enable sgd's Nesterov momentum")
    parser.add_argument("--rmsprop-alpha", default=0.99, type=float,
                        help="rmsprop's smoothing constant")
    parser.add_argument("--adam-beta1", default=0.9, type=float,
                        help="exponential decay rate for adam's first moment")
    parser.add_argument("--adam-beta2", default=0.999, type=float,
                        help="exponential decay rate for adam's second moment")

    # ---- training schedule (reference args.py:132-165) ----
    parser.add_argument("--max-epoch", default=60, type=int,
                        help="maximum epochs to run")
    parser.add_argument("--start-epoch", default=0, type=int,
                        help="manual epoch number (useful when restart)")
    parser.add_argument("--train-batch-size", default=2, type=int,
                        help="training batch size")
    parser.add_argument("--test-batch-size", default=1, type=int,
                        help="test batch size")
    parser.add_argument("--lr-scheduler", type=str, default="multi_step",
                        help="learning rate scheduler")
    parser.add_argument("--stepsize", default=[20, 40], nargs="+", type=int,
                        help="stepsize to decay learning rate")
    parser.add_argument("--gamma", default=0.1, type=float,
                        help="learning rate decay")

    # ---- dead ReID flags accepted for parity (reference args.py:170-237) ----
    parser.add_argument("--label-smooth", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--margin", type=float, default=0.3,
                        help=argparse.SUPPRESS)
    parser.add_argument("--num-instances", type=int, default=4,
                        help=argparse.SUPPRESS)
    parser.add_argument("--lambda-xent", type=float, default=1,
                        help=argparse.SUPPRESS)
    parser.add_argument("--lambda-htri", type=float, default=1,
                        help=argparse.SUPPRESS)
    parser.add_argument("--test_size", type=int, default=800,
                        help=argparse.SUPPRESS)
    parser.add_argument("--query-remove", type=bool, default=True,
                        help=argparse.SUPPRESS)
    parser.add_argument("--visualize-ranks", action="store_true",
                        help=argparse.SUPPRESS)

    # ---- architecture (reference args.py:201-206) ----
    parser.add_argument("-a", "--arch", type=str, default="SpectralTransformer")
    parser.add_argument("-lossf", "--lossf", type=str, default="L1")
    parser.add_argument("--no-pretrained", action="store_true",
                        help="do not load pretrained weights")
    parser.add_argument("--use-dwt", type=str, default="Fourier",
                        help="frequency transform for New* models: "
                             "Wavelet | Fourier | anything-else = identity")

    # ---- test (reference args.py:211-235) ----
    parser.add_argument("--load-weights", type=str, default="", metavar="PATH",
                        help="load pretrained weights but ignore layers that don't match")
    parser.add_argument("--evaluate", action="store_true", help="evaluate only")
    parser.add_argument("--eval-freq", type=int, default=-1,
                        help="evaluation frequency (set to -1 to test only in the end)")
    parser.add_argument("--start-eval", type=int, default=0,
                        help="start to evaluate after a specific epoch")

    # ---- misc (reference args.py:240-277) ----
    parser.add_argument("--print-freq", type=int, default=10,
                        help="print frequency")
    parser.add_argument("--seed", type=int, default=1, help="manual seed")
    parser.add_argument("--resume", type=str, default="", metavar="PATH",
                        help="resume from a checkpoint")
    parser.add_argument("--save-dir", type=str, default="log",
                        help="path to save log and model weights")
    parser.add_argument("--use-cpu", action="store_true", help="use cpu")
    parser.add_argument("--gpu-devices", default="0", type=str,
                        help="device ids (accepted for parity; ignored on TPU)")
    parser.add_argument("--use-avai-gpus", action="store_true",
                        help="use available devices instead of specified ones")
    parser.add_argument("--use-wandb", default=True, action="store_false",
                        dest="use_wandb",
                        help="disable Weights & Biases logging (enabled by default)")

    # ---- TPU-native extensions (no reference equivalent) ----
    parser.add_argument("--image-size", type=int, default=1024,
                        help="train/eval resolution (reference hardcodes "
                             "1024^2 in DataLoader.py:14)")
    parser.add_argument("--mesh-data", type=int, default=-1,
                        help="data-parallel mesh size; -1 = all devices")
    parser.add_argument("--mesh-context", type=int, default=1,
                        help="context-parallel mesh size (window-axis sharding)")
    parser.add_argument("--shard-params", type=str, default="",
                        choices=["", "data", "context"],
                        help="shard params+optimizer state: 'data' = "
                             "FSDP/ZeRO-style over the data axis, 'context' "
                             "= tensor-parallel kernel output-feature "
                             "sharding; default replicated")
    parser.add_argument("--compute-dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32", "float16"])
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the forward pass in backward "
                             "(jax.checkpoint) to fit large resolutions")
    parser.add_argument("--remat-policy", type=str, default="",
                        choices=["", "full", "mxu", "mxu+ew", "dots"],
                        help="activation-checkpoint policy with --remat: "
                             "''/'full' recomputes whole blocks (+~18%% "
                             "flops, max HBM savings); 'mxu' saves dot/conv/"
                             "FFT outputs and recomputes only elementwise "
                             "ops; 'mxu+ew' also saves tagged expensive "
                             "elementwise (dwconv/gelu) outputs; 'dots' "
                             "saves non-batch matmuls")
    parser.add_argument("--no-pallas", action="store_true",
                        help="disable the fused Pallas attention kernels "
                             "(sets UIRT_NO_PALLAS=1); the pure-XLA path is "
                             "numerically identical")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--profile-dir", type=str, default="",
                        help="write jax.profiler traces here when set")
    parser.add_argument("--vgg-weights", type=str, default="",
                        help="converted VGG16 .npz for perceptual losses")
    parser.add_argument("--cache-decoded", type=str, default="",
                        help="directory for a decoded-image uint8 memmap "
                             "cache: decode+resize happens once, later "
                             "epochs stream zero-copy (the reference "
                             "re-decodes every epoch)")
    parser.add_argument("--compile-cache", type=str,
                        default=DEFAULT_COMPILE_CACHE,
                        help="persistent XLA compilation-cache directory "
                             "(first compiles take 20-40 s through the "
                             "remote compile service; reruns of the same "
                             "config then load the cached executable). "
                             "Empty string disables")
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="gradient-accumulation microbatches per "
                             "optimizer step (train-batch-size must divide "
                             "evenly); accumulated inside the jitted step "
                             "via lax.scan with per-loss-family scaling, so "
                             "the optimizer sees exactly the full-batch "
                             "gradient (up to DropPath rng: microbatches "
                             "draw independent dropout noise) while only "
                             "one microbatch's activations are live")
    parser.add_argument("--steps-per-dispatch", type=int, default=1,
                        help="full optimizer steps per device dispatch "
                             "(lax.scan over K stacked batches inside one "
                             "jit call).  Training semantics are bit-"
                             "identical to K sequential steps; this "
                             "amortizes the fixed per-dispatch host round-"
                             "trip that otherwise bounds step rate")
    parser.add_argument("--watch-freq", type=int, default=100,
                        help="parameter/gradient histogram logging cadence "
                             "in steps (reference wandb.watch log_freq=100, "
                             "wandb_logger.py:27); 0 disables")
    parser.add_argument("--allow-placeholder-vgg", action="store_true",
                        help="run perceptual-family losses on a random "
                             "placeholder VGG trunk when no --vgg-weights "
                             "file exists (training will NOT match the "
                             "reference; intended for tests/benchmarks)")
    parser.add_argument("--train-raw", type=str, default="uw_data/uw_data/train/a",
                        help="train raw dir (hardcoded in reference main.py:52)")
    parser.add_argument("--train-ref", type=str, default="uw_data/uw_data/train/b",
                        help="train reference dir (reference main.py:53)")
    parser.add_argument("--test-raw", type=str, default="uw_data/uw_data/test/a",
                        help="test raw dir (reference main.py:67)")
    parser.add_argument("--test-ref", type=str, default="uw_data/uw_data/test/b",
                        help="test reference dir (reference main.py:68)")
    parser.add_argument("--image-in", type=str, default="image_in/",
                        help="inference input dir (reference main.py:73)")
    parser.add_argument("--image-out", type=str, default="image_out/",
                        help="inference output dir (reference main.py:74)")
    parser.add_argument("--infer-size", type=int, default=256,
                        help="inference resize (reference Visualiser.py:20)")

    return parser


# ---------------------------------------------------------------------------
# kwargs builders (reference args.py:282-335) — unused by the main path in
# the reference too, but part of its import surface.  The reference's
# dataset_kwargs reads a nonexistent ``parsed_args.loss_function``
# (args.py:303); here it reads the real ``lossf`` flag.
# ---------------------------------------------------------------------------
def dataset_kwargs(parsed_args):
    return {
        "root": parsed_args.root,
        "height": parsed_args.height,
        "width": parsed_args.width,
        "train_sampler": parsed_args.train_sampler,
        "random_erase": parsed_args.random_erase,
        "color_jitter": parsed_args.color_jitter,
        "color_aug": parsed_args.color_aug,
        "loss_function": parsed_args.lossf,
    }


def optimizer_kwargs(parsed_args):
    return {
        "optim": parsed_args.optim,
        "lr": parsed_args.lr,
        "weight_decay": parsed_args.weight_decay,
        "momentum": parsed_args.momentum,
        "sgd_dampening": parsed_args.sgd_dampening,
        "sgd_nesterov": parsed_args.sgd_nesterov,
        "rmsprop_alpha": parsed_args.rmsprop_alpha,
        "adam_beta1": parsed_args.adam_beta1,
        "adam_beta2": parsed_args.adam_beta2,
    }


def lr_scheduler_kwargs(parsed_args):
    return {
        "lr_scheduler": parsed_args.lr_scheduler,
        "stepsize": parsed_args.stepsize,
        "gamma": parsed_args.gamma,
        "max_epoch": parsed_args.max_epoch,
    }

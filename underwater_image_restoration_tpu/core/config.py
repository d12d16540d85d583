"""Typed configuration mirroring the reference CLI surface.

The reference drives everything through argparse strings (reference
``args.py:6-279``) matched in if/elif chains.  Here the same flag surface is
backed by a dataclass so that library users get a typed config and the CLI
(``cli/args.py``) is a thin parity layer on top.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

# Default persistent XLA compilation-cache dir (cli/args.py --compile-cache
# default; bench.py uses the same so CLI runs and bench runs share entries).
DEFAULT_COMPILE_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "uirt_xla")


@dataclasses.dataclass
class Config:
    # ---- data (reference args.py:14-80) ----
    root: str = "./datasets"
    height: int = 128
    width: int = 256
    workers: int = 4
    train_sampler: str = "RandomSampler"
    split_id: int = 0
    # aug flags (offline in the reference; online ops here)
    random_erase: bool = False
    color_jitter: bool = False
    color_aug: bool = False
    random_perspective: bool = False
    random_rotate: bool = False

    # ---- optimization (reference args.py:84-130) ----
    optim: str = "adam"
    lr: float = 0.0003
    weight_decay: float = 5e-4
    momentum: float = 0.9
    sgd_dampening: float = 0.0
    sgd_nesterov: bool = False
    rmsprop_alpha: float = 0.99
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999

    # ---- training schedule (reference args.py:132-166) ----
    max_epoch: int = 60
    start_epoch: int = 0
    train_batch_size: int = 2
    test_batch_size: int = 1
    lr_scheduler: str = "multi_step"
    stepsize: Sequence[int] = (20, 40)
    gamma: float = 0.1

    # ---- architecture (reference args.py:201-206) ----
    arch: str = "SpectralTransformer"
    lossf: str = "L1"
    no_pretrained: bool = False
    use_dwt: str = "Fourier"  # "Wavelet" | "Fourier" | anything-else = identity

    # ---- test / resume (reference args.py:211-248) ----
    load_weights: str = ""
    evaluate: bool = False
    eval_freq: int = -1
    start_eval: int = 0
    resume: str = ""

    # ---- misc (reference args.py:240-273) ----
    print_freq: int = 10
    seed: int = 1
    save_dir: str = "log"
    use_cpu: bool = False
    gpu_devices: str = "0"  # accepted for parity; ignored on TPU
    use_avai_gpus: bool = False
    use_wandb: bool = True

    # ---- TPU-native extensions (no reference equivalent) ----
    image_size: int = 1024        # train transform resolution (reference hardcodes 1024²; DataLoader.py:14)
    mesh_data: int = -1           # data-parallel mesh size; -1 = all devices
    mesh_context: int = 1         # context-parallel mesh size (window-axis sharding)
    shard_params: str = ""        # ""=replicated; "data"=FSDP/ZeRO-style over the
    #                               data axis; "context"=tensor-parallel kernel
    #                               output-feature sharding over the context axis
    compute_dtype: str = "bfloat16"   # bf16 compute / f32 params
    param_dtype: str = "float32"
    remat: bool = False           # jax.checkpoint the per-level blocks
    remat_policy: str = ""  # ""=all; "mxu"=save dot/conv/FFT; "mxu+ew"=+tagged ew
    #                               outputs, recompute elementwise only;
    #                               "dots"=save non-batch matmuls
    checkpoint_dir: str = "checkpoints"
    jsonl_metrics: bool = True    # JSONL metric sink alongside/instead of wandb
    profile_dir: str = ""         # when set, jax.profiler traces land here
    vgg_weights: str = ""         # path to converted VGG16 .npz for perceptual losses
    cache_decoded: str = ""       # when set, decode+resize once into a uint8
    #                               memmap cache dir and stream later epochs
    #                               from it (data/cache.py)
    compile_cache: str = ""       # persistent XLA compilation-cache dir
    #                               (cli/main.py enables it; empty = off —
    #                               the CLI default is DEFAULT_COMPILE_CACHE)
    watch_freq: int = 100         # param/grad histogram cadence in steps
    #                               (reference wandb.watch log_freq=100,
    #                               wandb_logger.py:27); 0 disables
    allow_placeholder_vgg: bool = False  # opt into random VGG trunk (tests/bench only)
    grad_accum: int = 1           # microbatches per optimizer step: the jitted
    #                               step scans train_batch_size/grad_accum-sized
    #                               microbatches, accumulating gradients with
    #                               per-loss-family scaling (== the full-batch
    #                               gradient for deterministic forwards; under
    #                               active DropPath each microbatch draws its
    #                               own rng) — trains effective batches beyond
    #                               what one forward's activations fit in HBM
    steps_per_dispatch: int = 1   # FULL optimizer steps per device dispatch
    #                               (lax.scan over K stacked batches).  Bit-
    #                               identical training semantics; amortizes
    #                               the fixed ~5 ms per-dispatch enqueue
    #                               round-trip of the remote TPU tunnel
    #                               relative to the real step time

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def from_namespace(ns) -> Config:
    """Build a Config from an argparse namespace produced by cli/args.py."""
    fields = {f.name for f in dataclasses.fields(Config)}
    kv = {}
    for k, v in vars(ns).items():
        k2 = k.replace("-", "_")
        # CLI parity names that differ from dataclass field names
        alias = {
            "randomPerspective": "random_perspective",
            "randomRotate": "random_rotate",
        }.get(k2, k2)
        if alias in fields and v is not None:
            kv[alias] = v
    return Config(**kv)

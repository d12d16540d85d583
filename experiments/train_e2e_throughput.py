"""End-to-end Trainer throughput on the real chip (not benchlib).

benchlib times the jitted step over pre-staged device batches; this script
runs the REAL ModelTrainer.train loop — host decode/prefetch, device_put,
K-grouped dispatch, metric bookkeeping, validation, checkpointing — on a
synthetic on-disk dataset, so the trainer's own `img/s` epoch line can be
compared against the benchlib ceiling.  Round-2 regression context: the
grouped-dispatch path used to issue eager per-batch image/metric slice ops
(2-3 extra dispatches per batch through the ~5 ms tunnel round-trip); the
fix defers them to duty-cycled thunks + one epoch-end device_get.

Usage: python experiments/train_e2e_throughput.py [--images 512] [--k 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_train: int, n_test: int, size: int) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("test", n_test)):
        for sub in ("a", "b"):
            os.makedirs(os.path.join(root, split, sub), exist_ok=True)
        for i in range(n):
            for sub in ("a", "b"):
                arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(root, split, sub, f"{i:05d}.png"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--arch", default="SpectralTransformer")
    a = p.parse_args()

    from underwater_image_restoration_tpu.core.config import Config
    from underwater_image_restoration_tpu.train.trainer import ModelTrainer

    with tempfile.TemporaryDirectory() as root:
        print(f"generating {a.images}+{a.batch} synthetic {a.size}^2 pairs...",
              flush=True)
        make_dataset(root, a.images, a.batch, a.size)
        cfg = Config(
            arch=a.arch, lossf="L1withColor", lr=3e-4,
            max_epoch=a.epochs, train_batch_size=a.batch,
            test_batch_size=a.batch, image_size=a.size,
            steps_per_dispatch=a.k, use_wandb=False, workers=2,
            print_freq=10_000, watch_freq=0, seed=0,
            checkpoint_dir=os.path.join(root, "ck"),
        )
        tr = ModelTrainer(
            os.path.join(root, "train", "a"), os.path.join(root, "train", "b"),
            os.path.join(root, "test", "a"), os.path.join(root, "test", "b"),
        )
        tr.train(cfg)  # the epoch lines print img/s (epoch 1+ exclude compile)


if __name__ == "__main__":
    main()

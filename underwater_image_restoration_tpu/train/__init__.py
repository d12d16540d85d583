"""Training subsystem (reference ``src/ModelTrainer.py``), TPU-native.

One jitted train step (forward + loss + grad + global-norm clip 1.0 + optax
update) runs data-parallel over a ``jax.sharding.Mesh``; validation is a
second jitted step computing loss/PSNR/SSIM per sample.  Checkpointing is
Orbax with real best/latest tracking and full resume (params, opt state,
epoch, loader order) — the reference's best-loss tracking is broken by a
pass-by-value bug (ModelTrainer.py:56,160,174) and ``--resume`` is parsed but
never used (SURVEY.md §5).
"""
from .metrics import psnr_metric, ssim_metric
from .optim import get_optimizer, multistep_lr, set_learning_rate
from .checkpoint import CheckpointManager, restore_params
from .trainer import ModelTrainer, TrainState, make_eval_step, make_train_step

__all__ = [
    "CheckpointManager",
    "ModelTrainer",
    "TrainState",
    "get_optimizer",
    "make_eval_step",
    "make_train_step",
    "multistep_lr",
    "psnr_metric",
    "restore_params",
    "set_learning_rate",
]

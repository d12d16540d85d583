"""Optimizer + LR schedule (reference ModelTrainer.py:55,197-204).

The reference supports adam/adamw only, at torch defaults, and *ignores* the
CLI's --weight-decay/--momentum/etc flags; the scheduler is hardcoded
``MultiStepLR(milestones=[1,100,250], gamma=0.25)`` stepping per epoch.

Here: optax chains ``clip_by_global_norm(1.0)`` (ModelTrainer.py:87) with the
chosen optimizer; adam/adamw default to torch's hyperparameters
(betas 0.9/0.999, eps 1e-8, adamw wd 0.01) for parity, and sgd/rmsprop are
implemented for real since the flags exist in the CLI surface.  The learning
rate is an injected hyperparameter so the per-epoch MultiStep schedule is a
host-side assignment, not a recompile.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

GRAD_CLIP_NORM = 1.0
DEFAULT_MILESTONES = (1, 100, 250)
DEFAULT_GAMMA = 0.25


def multistep_lr(base_lr: float, milestones: Sequence[int] = DEFAULT_MILESTONES,
                 gamma: float = DEFAULT_GAMMA):
    """lr(epoch) matching torch MultiStepLR stepped at each epoch end:
    factor gamma^(# milestones <= epoch)."""
    ms = sorted(milestones)

    def lr(epoch: int) -> float:
        return base_lr * gamma ** sum(1 for m in ms if epoch >= m)

    return lr


def get_optimizer(optim: str, learning_rate: float, *,
                  weight_decay: float = 0.01, momentum: float = 0.9,
                  sgd_dampening: float = 0.0, sgd_nesterov: bool = False,
                  rmsprop_alpha: float = 0.99,
                  adam_beta1: float = 0.9, adam_beta2: float = 0.999,
                  clip_norm: float = GRAD_CLIP_NORM) -> optax.GradientTransformation:
    """Build grad-clip + optimizer with an injected learning_rate hyperparam."""
    kw = {}
    if optim == "adam":
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, b1=adam_beta1, b2=adam_beta2, eps=1e-8)
    elif optim == "adamw":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, b1=adam_beta1, b2=adam_beta2,
            eps=1e-8, weight_decay=weight_decay)
    elif optim == "sgd":
        tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=learning_rate, momentum=momentum or None,
            nesterov=sgd_nesterov)
        del sgd_dampening  # torch-only knob; optax sgd has no dampening
    elif optim == "rmsprop":
        tx = optax.inject_hyperparams(optax.rmsprop)(
            learning_rate=learning_rate, decay=rmsprop_alpha, eps=1e-8,
            momentum=momentum)
    else:
        raise ValueError(f"Unsupported optimizer: {optim}")
    del kw
    if clip_norm and clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Assign the injected learning_rate inside a chained opt state."""
    # optax.chain state is a tuple; inject_hyperparams state carries .hyperparams
    def assign(st):
        if hasattr(st, "hyperparams") and "learning_rate" in st.hyperparams:
            st.hyperparams["learning_rate"] = jnp.asarray(
                lr, dtype=st.hyperparams["learning_rate"].dtype
            )
            return True
        return False

    if isinstance(opt_state, tuple):
        for st in opt_state:
            if assign(st):
                return opt_state
    assign(opt_state)
    return opt_state


def get_learning_rate(opt_state) -> float:
    if isinstance(opt_state, tuple):
        for st in opt_state:
            if hasattr(st, "hyperparams") and "learning_rate" in st.hyperparams:
                return float(st.hyperparams["learning_rate"])
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    raise ValueError("no injected learning_rate in opt state")

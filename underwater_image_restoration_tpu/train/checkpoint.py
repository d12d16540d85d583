"""Orbax checkpointing with true best/latest tracking and full resume.

Logical contents match the reference's torch.save payload
(ModelTrainer.py:176-181: epoch, model_state_dict, optimizer_state_dict,
loss) plus the data-loader iteration state so a resumed run replays the exact
remaining batch order.  Fixes two reference defects (SURVEY.md §5):
- best-loss tracking (by-value bug at ModelTrainer.py:56,160,174 made every
  epoch a "best" file);
- ``--resume`` / ``Models.resume_model`` which are parsed/defined but dead.

Layout: ``<dir>/<step>/state``  (Orbax CheckpointManager, async save), with
``best_step``/``latest_step`` queryable and params-only restore for inference.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 keep_best: bool = True):
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m["val_loss"]) if keep_best else None,
            best_mode="min",
            enable_async_checkpointing=True,
        )
        os.makedirs(_abs(directory), exist_ok=True)
        self._mgr = ocp.CheckpointManager(_abs(directory), options=options)

    def save(self, step: int, *, params, opt_state, epoch: int,
             val_loss: float, loader_state: Optional[dict] = None,
             extra: Optional[dict] = None):
        state = {
            "params": params,
            "opt_state": opt_state,
            "epoch": epoch,
            "loss": float(val_loss),
            "loader": loader_state or {},
            "extra": extra or {},
        }
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={"val_loss": float(val_loss)},
        )

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> dict:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint to restore")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_params(path: str, step: Optional[int] = None):
    """Params-only restore for inference (reference
    Visualiser.loadModelFromWeights reads ['model_state_dict'],
    Visualiser.py:66).  ``path`` is a CheckpointManager directory or a single
    step directory."""
    path = _abs(path)
    # single-step dir (contains the item subdir written by StandardSave)?
    entries = set(os.listdir(path)) if os.path.isdir(path) else set()
    if "default" in entries or "_CHECKPOINT_METADATA" in entries:
        with ocp.StandardCheckpointer() as ck:
            state = ck.restore(os.path.join(path, "default")
                               if "default" in entries else path)
        return state["params"]
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        state = mgr.restore(step)
    return state["params"]


def best_or_latest_params(directory: str):
    """Prefer the best-val-loss checkpoint, fall back to latest."""
    directory = _abs(directory)
    with ocp.CheckpointManager(directory) as mgr:
        step = mgr.best_step()
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        state = mgr.restore(step)
    return state["params"], step

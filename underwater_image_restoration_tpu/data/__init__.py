"""Data subsystem (reference ``src/DataManipulation/``), TPU-first.

Differences from the reference by design:

- The host pipeline produces **uint8 NHWC** batches; the ``(x/255 - .5)/.5``
  normalization of the reference transform (DataLoader.py:13-20) is fused
  on-device inside the jitted train step (see ``train.trainer``), halving
  host->device transfer bytes.
- The loader is a deterministic, *checkpointable* iterator
  (``state_dict``/``load_state_dict``) — the reference's DataLoader order is
  lost on crash (SURVEY.md §5 fault tolerance).
- Augmentation is **online and pair-consistent** (geometric ops applied with
  shared randomness to raw+reference) instead of the reference's offline,
  per-directory ``DataAugmentor`` whose orchestration is dead code
  (DataManager.py:55-62 calls nonexistent kwargs; main.py:60-62 commented
  out).  Probabilities/ranges match DataAugmentor.py:15-20.
"""
from .uieb import UIEBDataset, load_pair_listing
from .loader import PairedLoader, get_dataloaders
from .augment import AugmentConfig, augment_pair_batch
from .manager import DataManager
from .offline_augment import DataAugmentor
from .custom import CustomImageDataset, U45Dataset
from .synthetic import synthetic_pair_batch

__all__ = [
    "AugmentConfig",
    "CustomImageDataset",
    "DataAugmentor",
    "DataManager",
    "PairedLoader",
    "UIEBDataset",
    "augment_pair_batch",
    "get_dataloaders",
    "load_pair_listing",
    "synthetic_pair_batch",
    "U45Dataset",
]

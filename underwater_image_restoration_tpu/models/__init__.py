"""Model zoo registry (reference ``src/Models/__init__.py``).

``init_model(name, use_dwt=...)`` mirrors the reference factory with its
crashes fixed (SURVEY.md #3): the reference pops-and-discards ``use_dwt`` for
every arch except "NewModel", and the NewModel branch raises AttributeError.
Here ``use_dwt`` reaches every model of the New* family (the only ones that
accept it) and is discarded for SpectralTransformer/AST.

``resume_model`` (broken in the reference, Models/__init__.py:32-36) is
implemented for real in ``train.checkpoint``.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .ast import AST
from .new_model import NewBigFRFNModel, NewBigModel, NewModel
from .spectral_transformer import SpectralTransformer
from ..ops.init import trunc_normal_init

_USE_DWT_ARCHS = {"NewModel", "NewBigModel", "NewBigFRFNModel"}
# size-specialized archs (window masks / drop-path schedules derive from
# img_size); SpectralTransformer is fully size-agnostic
_SIZE_ARCHS = {"AST", "NewModel", "NewBigModel", "NewBigFRFNModel"}
# archs supporting lax.scan over stacked per-block params (HLO shrink for
# the remote compile host; see SpectralTransformer.scan_blocks)
_SCAN_ARCHS = {"SpectralTransformer"}

_MODEL_FACTORY = {
    "SpectralTransformer": SpectralTransformer,
    "NewModel": NewModel,
    "NewBigModel": NewBigModel,
    "NewBigFRFNModel": NewBigFRFNModel,
    "AST": AST,
}


def get_names():
    return list(_MODEL_FACTORY.keys())


def init_model(name: str, *args, **kwargs):
    """Construct a model module by registry name.

    kwargs are forwarded to the flax module; ``use_dwt`` is dropped for archs
    that don't take it (SpectralTransformer, AST) — reference behavior minus
    the crash.
    """
    if name not in _MODEL_FACTORY:
        raise KeyError(f"Unknown model: {name}")
    if "use_dwt" in kwargs and name not in _USE_DWT_ARCHS:
        kwargs.pop("use_dwt")
    if "img_size" in kwargs and name not in _SIZE_ARCHS:
        kwargs.pop("img_size")
    if "scan_blocks" in kwargs and name not in _SCAN_ARCHS:
        kwargs.pop("scan_blocks")
    return _MODEL_FACTORY[name](*args, **kwargs)


def reinit_linear_trunc_normal(params, rng, std: float = 0.02):
    """Re-initialize every Dense (2D) kernel with trunc_normal(std) and its
    bias with zeros — reproduces AST's ``_init_weights`` pass over nn.Linear
    (reference AST.py:865-872).  Conv kernels (4D) keep torch defaults.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    init = trunc_normal_init(std)
    leaves = []
    # identify Dense parents: path ending in 'kernel' with 2D leaf
    dense_parents = set()
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", None) for p in path)
        if keys and keys[-1] == "kernel" and leaf.ndim == 2:
            dense_parents.add(keys[:-1])
    rngs = jax.random.split(rng, max(1, len(flat)))
    for i, (path, leaf) in enumerate(flat):
        keys = tuple(getattr(p, "key", None) for p in path)
        if keys and keys[-1] == "kernel" and leaf.ndim == 2:
            leaves.append(init(rngs[i], leaf.shape, leaf.dtype))
        elif keys and keys[-1] == "bias" and keys[:-1] in dense_parents:
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


__all__ = [
    "AST",
    "NewBigFRFNModel",
    "NewBigModel",
    "NewModel",
    "SpectralTransformer",
    "get_names",
    "init_model",
    "reinit_linear_trunc_normal",
]

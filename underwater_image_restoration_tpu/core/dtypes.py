"""Dtype policy: bf16 compute, f32 params/loss (TPU MXU-friendly).

The reference runs everything in f32 on CUDA.  On TPU the MXU natively
multiplies bf16 with f32 accumulation, so the policy here is bf16 activations
with f32 parameters and f32 loss/metric accumulation.  Set
``compute_dtype="float32"`` for bit-level parity testing.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "f32": jnp.float32,
    "float16": jnp.float16,
}


def resolve_dtype(name):
    if not isinstance(name, str):
        return name
    try:
        return _DTYPES[name]
    except KeyError:
        raise ValueError(f"Unknown dtype name: {name!r}") from None


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    compute_dtype: object = jnp.float32
    param_dtype: object = jnp.float32

    @classmethod
    def from_config(cls, cfg) -> "DTypePolicy":
        return cls(
            compute_dtype=resolve_dtype(cfg.compute_dtype),
            param_dtype=resolve_dtype(cfg.param_dtype),
        )

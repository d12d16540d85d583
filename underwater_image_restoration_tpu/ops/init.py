"""Parameter initializers reproducing the reference's init statistics.

The reference mixes three init regimes:
- torch defaults for Conv2d/Linear (kaiming-uniform with a=sqrt(5), i.e.
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)), bias likewise) — used everywhere the
  model does not call an explicit initializer.
- ``trunc_normal_(std=.02)`` for Linear weights + zero bias + unit LayerNorm,
  applied by AST via ``self.apply`` (reference ``AST.py:863-872``).
- ``xavier_normal_`` for convs in the New* family's ``_init_weights``
  (reference ``model/model.py:231-232``) — defined but never applied, so the
  New* family actually uses torch defaults too.

Training from scratch only needs matching *distributions*, not bits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fan_in_from_shape(shape):
    # flax kernels: Dense (in, out); Conv HWIO (kh, kw, in, out)
    if len(shape) == 2:
        return shape[0]
    if len(shape) == 4:
        return shape[0] * shape[1] * shape[2]
    # fallback: product of all but last dim
    return int(np.prod(shape[:-1]))


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch default kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = max(1, _fan_in_from_shape(shape))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_bias_init(fan_in: int):
    """torch default bias init U(+-1/sqrt(fan_in)) — fan_in of the layer."""
    bound = 1.0 / np.sqrt(max(1, fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def trunc_normal_init(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated to [-2std, 2std]."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def xavier_normal_init(key, shape, dtype=jnp.float32):
    if len(shape) == 4:
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
    else:
        fan_in, fan_out = shape[0], shape[-1]
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)

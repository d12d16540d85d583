"""Grad-CAM interpretability (reference ``src/Interpretability.ipynb``).

The notebook runs pytorch_grad_cam's GradCAM on ``model.output_proj.proj``
with a sum-of-output target (cells 0-4).  JAX version: capture the target
module's activation A via ``flax.linen.intercept_methods``, get
G = d(sum(output))/dA with a zero perturbation added at that point, then
CAM = relu(sum_c GAP(G)_c * A_c), min-max normalized — the standard GradCAM
weighting pytorch_grad_cam applies.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _match(path: Tuple[str, ...], suffix: Sequence[str]) -> bool:
    suffix = tuple(suffix)
    return len(path) >= len(suffix) and path[-len(suffix):] == suffix


def _activation_shape(model, params, x, target_path) -> tuple:
    shape = {}

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if (context.method_name == "__call__"
                and _match(context.module.path, target_path)
                and isinstance(out, jnp.ndarray)):
            shape["s"] = out.shape
        return out

    with nn.intercept_methods(interceptor):
        jax.eval_shape(lambda p, a: model.apply(p, a), params, x)
    if "s" not in shape:
        raise ValueError(f"no module with path suffix {target_path}")
    return shape["s"]


def grad_cam(model, params, x, target_path: Sequence[str]):
    """Returns (cam[H,W] in [0,1] upsampled to input size, activation)."""
    a_shape = _activation_shape(model, params, x, target_path)

    def forward(eps):
        act = {}

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            if (context.method_name == "__call__"
                    and _match(context.module.path, tuple(target_path))
                    and isinstance(out, jnp.ndarray)
                    and out.shape == a_shape and "a" not in act):
                out = out + eps
                act["a"] = out
            return out

        with nn.intercept_methods(interceptor):
            y = model.apply(params, x)
        return jnp.sum(y), act["a"]

    grads, act = jax.grad(forward, has_aux=True)(jnp.zeros(a_shape, jnp.float32))
    a = act
    if a.ndim == 3:  # tokens (B,L,C) -> (B,H,W,C)
        hw = int(np.sqrt(a.shape[1]))
        a = a.reshape(a.shape[0], hw, hw, a.shape[2])
        grads = grads.reshape(a.shape)
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # GAP over space
    cam = jax.nn.relu(jnp.sum(weights * a, axis=-1))[0]
    cam = cam - cam.min()
    cam = cam / (cam.max() + 1e-8)
    if cam.shape != x.shape[1:3]:
        cam = jax.image.resize(cam, x.shape[1:3], "bilinear")
    return np.asarray(cam), np.asarray(act)

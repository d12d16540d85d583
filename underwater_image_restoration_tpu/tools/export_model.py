"""AOT model export for serving (StableHLO via ``jax.export``).

The reference deploys by shipping Python + a ``.pth`` and re-running torch
(Dockerfile:12).  The TPU-native deployment path is ahead-of-time: lower the
jitted forward once, serialize the StableHLO artifact, and serve it from any
process — no flax/model code, no Python model definition, versioned-stable
(jax.export guarantees N-month compatibility windows).

- ``export_model(arch, variables, ...) -> bytes`` — serialize the forward
  (params are BAKED into the artifact as constants, so serving needs no
  checkpoint loading).
- ``load_exported(blob) -> fn`` — deserialize; ``fn(images_f32_nhwc)``.
- Batch is exported SYMBOLIC by default, so one artifact serves any batch
  size (height/width stay static — the models are built per-resolution,
  matching the reference's fixed 256²/1024² pipelines).

CLI:
    python -m underwater_image_restoration_tpu.tools.export_model \
        -a SpectralTransformer --weights params.npz --size 256 \
        --platforms tpu,cpu --out model.hlo
"""
from __future__ import annotations

import argparse
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..models import init_model


def export_model(
    arch: str,
    variables,
    size: int = 256,
    batch: Optional[int] = None,
    use_dwt: str = "Fourier",
    compute_dtype=jnp.bfloat16,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> bytes:
    """Serialize the deterministic forward of ``arch`` with ``variables``
    baked in.  ``batch=None`` exports a symbolic batch dimension."""
    model = init_model(arch, img_size=size, use_dwt=use_dwt,
                       dtype=compute_dtype)

    def forward(x):
        return model.apply(variables, x, deterministic=True).astype(
            jnp.float32)

    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    exp = jax_export.export(jax.jit(forward), platforms=list(platforms))(spec)
    return exp.serialize()


def load_exported(blob: bytes):
    """bytes -> fn(images_f32_nhwc) running the exported forward."""
    exp = jax_export.deserialize(blob)

    def fn(x):
        return exp.call(x)

    return fn


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-a", "--arch", default="SpectralTransformer")
    p.add_argument("--weights", required=True,
                   help=".npz from tools.convert_checkpoint or a flax "
                        "checkpoint dir from training")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=0,
                   help="0 = symbolic (any batch at serve time)")
    p.add_argument("--use-dwt", default="Fourier")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--out", required=True)
    a = p.parse_args(argv)

    import os

    import numpy as np

    if os.path.isdir(a.weights):
        from ..train.checkpoint import restore_params

        # restore_params already returns the full flax variables dict
        # ({'params': ...} — TrainState.params is model.init's output);
        # only the flat .npz branch needs wrapping.
        variables = restore_params(a.weights)
    else:
        flat = dict(np.load(a.weights))
        from .convert_checkpoint import unflatten

        variables = {"params": unflatten(flat)}
    blob = export_model(a.arch, variables, size=a.size,
                        batch=a.batch or None, use_dwt=a.use_dwt,
                        platforms=a.platforms.split(","))
    with open(a.out, "wb") as f:
        f.write(blob)
    print(f"wrote {a.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={a.platforms}, batch="
          f"{'symbolic' if not a.batch else a.batch})")


if __name__ == "__main__":
    main()

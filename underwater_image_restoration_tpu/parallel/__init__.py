"""Parallelism primitives (SURVEY.md §2.2 — all absent in the reference).

Data parallelism lives in ``train.trainer`` (NamedSharding over the 'data'
mesh axis; XLA inserts the gradient psum).  This package adds **context
parallelism** over the 'context' axis for the window-attention models:

- windows are embarrassingly parallel, so CP = sharding the spatial row
  axis; shifted windows need only a halo exchange of boundary row strips
  (``halo_exchange`` / ``ppermute``);
- the global-FFT branches decompose into local FFTs + an all-to-all
  transpose (``sharded_fft2``), the standard distributed-FFT recipe.
"""
from .tensor import shard_params_tp, tp_shardings
from .context import (
    cp_shift_roll,
    cp_window_attention,
    halo_exchange,
    sharded_fft2,
    sharded_ifft2,
    spatial_sharding,
    ulysses_window_attention,
)

__all__ = [
    "cp_shift_roll",
    "cp_window_attention",
    "halo_exchange",
    "sharded_fft2",
    "sharded_ifft2",
    "shard_params_tp",
    "spatial_sharding",
    "tp_shardings",
    "ulysses_window_attention",
]

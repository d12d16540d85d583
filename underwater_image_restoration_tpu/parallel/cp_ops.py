"""Context-parallel op dispatchers used INSIDE model forwards.

Every function takes an optional ``mesh``.  With ``mesh=None`` (or a mesh
whose 'context' axis is 1, or shapes that don't divide across it) the local
single-device op runs — so the same model code serves one chip and a
('data','context') mesh, and ``model.init`` (batch 1) always traces the
local path, keeping the parameter tree identical in both modes.

When the mesh is viable, the communication-heavy pieces route through the
``parallel.context`` shard_map primitives (VERDICT.md next #2):

- cyclic SW-MSA rolls       -> one halo ``ppermute`` of a shift-row strip
                               (reference AST.py:597-617);
- window attention          -> window axis sharded over 'context', batch
                               over 'data' (windows are independent);
- global spatial FFTs       -> local FFT + all_to_all transpose + local FFT
                               (the distributed-FFT recipe), used by the
                               spectral branches (SpectralTransformer.py:
                               102-113,161-188; block.py:518-556).

Viability is a static-shape decision made at trace time: Python branches on
array shapes are free under jit.  Deep U-Net levels whose row count no
longer divides the context axis simply fall back to local compute — the
right choice anyway (tiny levels are cheaper to compute than to shard).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.meshes import CONTEXT_AXIS, DATA_AXIS
from ..ops.spectral import fft2 as _local_fft2, ifft2 as _local_ifft2


def context_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get(CONTEXT_AXIS, 1))


def data_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get(DATA_AXIS, 1))


def cp_spatial_viable(x, mesh: Optional[Mesh], min_rows: int = 1) -> bool:
    """True when NHWC ``x`` can be row-sharded over the mesh: batch divides
    'data', H divides 'context' with at least ``min_rows`` rows/shard."""
    t = context_size(mesh)
    if t <= 1:
        return False
    b, h = x.shape[0], x.shape[1]
    d = data_size(mesh)
    return b % d == 0 and h % t == 0 and (h // t) >= min_rows


def cp_fft_viable(x, mesh: Optional[Mesh]) -> bool:
    """sharded_fft2 additionally transposes W across the mesh, so W must
    divide the context size too."""
    t = context_size(mesh)
    return cp_spatial_viable(x, mesh) and x.shape[2] % t == 0


def roll2d(x, shift_h: int, shift_w: int, mesh: Optional[Mesh] = None):
    """jnp.roll over the spatial axes of NHWC; one halo ppermute when the
    row axis is context-sharded."""
    if shift_h == 0 and shift_w == 0:
        return x
    t = context_size(mesh)
    if not cp_spatial_viable(x, mesh, min_rows=abs(shift_h)):
        return jnp.roll(x, (shift_h, shift_w), axis=(1, 2))
    from .context import cp_roll2d

    return cp_roll2d(x, shift_h, shift_w, mesh)


def fft2(x, mesh: Optional[Mesh] = None):
    """2D FFT over (H, W) of NHWC; distributed transpose decomposition when
    row-sharded (complex64 output either way)."""
    if not cp_fft_viable(x, mesh):
        return _local_fft2(x.astype(jnp.complex64))
    from .context import sharded_fft2

    return sharded_fft2(x, mesh)


def ifft2(x, mesh: Optional[Mesh] = None):
    if not cp_fft_viable(x, mesh):
        return _local_ifft2(x.astype(jnp.complex64))
    from .context import sharded_ifft2

    return sharded_ifft2(x, mesh)


def fftn_real_spatial(x, mesh: Optional[Mesh] = None):
    """real(fft2(x)) — the reference's lossy frequency projection
    (SpectralTransformer.py:103, block.py:538)."""
    return jnp.real(fft2(x.astype(jnp.float32), mesh)).astype(x.dtype)


def ifftn_real_spatial(x, mesh: Optional[Mesh] = None):
    return jnp.real(ifft2(x.astype(jnp.float32), mesh)).astype(x.dtype)


def spectral_tile_upsample(mag, phase, mesh: Optional[Mesh] = None):
    """FFT-upsample core (reference SpectralTransformer.py:174-187): tile
    magnitude/phase 2x2 in space, polar recombine, ifft2, abs — computed via
    the analytic identity ifft2(tile(F,2,2)) == zero_stuff2x(ifft2(F))
    (see ops.spectral.spectral_tile_upsample), so the distributed inverse
    FFT runs at (H, W) instead of (2H, 2W).  The even-position stuffing of a
    row-sharded map stays shard-local (each shard's 2x rows come from its
    own source rows; GSPMD keeps it comm-free)."""
    from ..ops.spectral import safe_abs, zero_stuff2x

    comp = (mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)).astype(
        jnp.complex64)
    return zero_stuff2x(safe_abs(ifft2(comp, mesh)))


def cp_attention_viable(batch: int, n_win_h: int,
                        mesh: Optional[Mesh]) -> bool:
    t = context_size(mesh)
    if t <= 1:
        return False
    return batch % data_size(mesh) == 0 and n_win_h % t == 0


def window_attention(q, k, v, bias, *, scale: float, sparse_w=None,
                     mask=None, mesh: Optional[Mesh] = None,
                     batch: Optional[int] = None,
                     n_win_h: Optional[int] = None):
    """CP-aware drop-in for ``ops.attention.window_attention``: shards the
    window axis over 'context' (batch over 'data') when ``mesh``/``batch``/
    ``n_win_h`` describe a viable layout, else runs the local dispatcher
    (which itself picks the Pallas kernel on TPU when enabled)."""
    from ..ops.attention import window_attention as local_attention

    if (batch is None or n_win_h is None
            or not cp_attention_viable(batch, n_win_h, mesh)):
        return local_attention(q, k, v, bias, scale=scale,
                               sparse_w=sparse_w, mask=mask)
    from .context import cp_window_attention_qkv

    return cp_window_attention_qkv(q, k, v, bias, scale=scale, mesh=mesh,
                                   batch=batch, sparse_w=sparse_w, mask=mask)

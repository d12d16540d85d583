"""Context-parallel primitives over the ('data','context') mesh.

All functions here are written to run INSIDE ``shard_map`` over the
'context' axis (they use ``ppermute`` / ``all_to_all``), with thin
driver wrappers that set up the shard_map for direct use.

Sequence length for these models is the pixel count (L = H*W, up to ~1M at
the reference's 1024^2 training resolution — SURVEY.md §5 long-context).
The reference scales L only algorithmically (8x8 windows, channel
attention); here the window axis itself is sharded across chips:

- rows of the NHWC image are split over 'context' (each shard holds
  H/n_ctx full-width row bands, a multiple of the window size);
- unshifted window attention needs NO communication;
- shifted windows (reference AST.py:597-617 cyclic roll) need exactly one
  ``shift_size``-row halo strip moved to the previous neighbor — a single
  ppermute over ICI, O(shift/H) of the activation bytes;
- the spectral models' global FFTs decompose into FFT-over-W locally,
  all_to_all transpose, FFT-over-H locally (``sharded_fft2``).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.meshes import CONTEXT_AXIS
from ..ops.attention import window_attention_core
from ..ops.windows import window_partition, window_reverse


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC with the H (row) axis split over 'context' and batch over
    'data'."""
    return NamedSharding(mesh, P("data", CONTEXT_AXIS, None, None))


# --------------------------------------------------------------------------
# halo exchange
# --------------------------------------------------------------------------
def halo_exchange(x_local, halo: int, axis_name: str = CONTEXT_AXIS,
                  direction: str = "up"):
    """Move a ``halo``-row boundary strip to the neighboring shard.

    direction="up": each shard receives the FIRST ``halo`` rows of the NEXT
    shard (wrapping), i.e. what a cyclic roll by -halo needs.
    direction="down": each shard receives the LAST ``halo`` rows of the
    PREVIOUS shard (for roll by +halo).

    x_local: (B, H_loc, W, C) local block.  Returns the (B, halo, W, C)
    strip received over ICI.
    """
    n = jax.lax.axis_size(axis_name)
    if direction == "up":
        strip = x_local[:, :halo]
        perm = [(i, (i - 1) % n) for i in range(n)]  # send to previous
    else:
        strip = x_local[:, -halo:]
        perm = [(i, (i + 1) % n) for i in range(n)]  # send to next
    return jax.lax.ppermute(strip, axis_name, perm)


def cp_shift_roll(x_local, shift: int, axis_name: str = CONTEXT_AXIS):
    """Distributed jnp.roll(x, -shift, axis=1) for the H-sharded image —
    the cyclic shift of SW-MSA (reference AST.py:597).  One ppermute."""
    if shift == 0:
        return x_local
    incoming = halo_exchange(x_local, shift, axis_name, direction="up")
    return jnp.concatenate([x_local[:, shift:], incoming], axis=1)


def cp_unshift_roll(x_local, shift: int, axis_name: str = CONTEXT_AXIS):
    """Inverse roll (+shift, reference AST.py:613)."""
    if shift == 0:
        return x_local
    incoming = halo_exchange(x_local, shift, axis_name, direction="down")
    return jnp.concatenate([incoming, x_local[:, :-shift]], axis=1)


# --------------------------------------------------------------------------
# context-parallel window attention
# --------------------------------------------------------------------------
def _cp_window_attention_local(
    x_local, bias, sparse_w, mask_local, *, win_size: int, num_heads: int,
    scale: float, shift: int, axis_name: str,
):
    """Runs inside shard_map: shift roll (1 ppermute) -> local window
    attention -> unshift roll (1 ppermute).  qkv here are identity
    projections of x (projection weights live in the model layer; this
    primitive parallelizes the attention core itself)."""
    b, h_loc, w, c = x_local.shape
    y = cp_shift_roll(x_local, shift, axis_name)
    wins = window_partition(y, win_size)            # (B*nW_loc, ws, ws, C)
    n = win_size * win_size
    toks = wins.reshape(wins.shape[0], n, c)
    d = c // num_heads
    qkv = toks.reshape(toks.shape[0], n, num_heads, d).transpose(0, 2, 1, 3)
    out = window_attention_core(qkv, qkv, qkv, bias, scale=scale,
                                sparse_w=sparse_w, mask=mask_local)
    out = out.transpose(0, 2, 1, 3).reshape(wins.shape[0], n, c)
    out = window_reverse(out.reshape(-1, win_size, win_size, c),
                         win_size, h_loc, w)
    return cp_unshift_roll(out, shift, axis_name)


def cp_window_attention(
    x, bias, *, mesh: Mesh, win_size: int = 8, num_heads: int = 1,
    scale: Optional[float] = None, sparse_w=None, shift: int = 0,
    mask=None,
):
    """Window self-attention with the spatial row axis sharded over
    'context' and batch over 'data'.

    x: (B, H, W, C) global array.  H/n_ctx must be a multiple of win_size.
    mask: optional (nW, N, N) global shift mask; rows of windows are
    distributed, so each shard gets its nW/n_ctx contiguous slice.
    Semantics match the single-device path exactly (tests assert equality).
    """
    b, h, w, c = x.shape
    n_ctx = mesh.shape[CONTEXT_AXIS]
    if (h // n_ctx) % win_size:
        raise ValueError(
            f"H/n_ctx = {h}/{n_ctx} not a multiple of win_size={win_size}")
    scale = (c // num_heads) ** -0.5 if scale is None else scale
    mask_in = mask if mask is not None else jnp.zeros((n_ctx, 1, 1),
                                                      jnp.float32)

    use_sparse = sparse_w is not None
    use_mask = mask is not None

    def body(xl, bl, swl, ml):
        # placeholders must degrade to None (zeros sparse_w would still mix)
        return _cp_window_attention_local(
            xl, bl, swl if use_sparse else None, ml if use_mask else None,
            win_size=win_size, num_heads=num_heads,
            scale=scale, shift=shift, axis_name=CONTEXT_AXIS)

    sw_in = sparse_w if sparse_w is not None else jnp.zeros((2,), jnp.float32)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", CONTEXT_AXIS, None, None), P(), P(),
                  (P(CONTEXT_AXIS, None, None) if mask is not None else P())),
        out_specs=P("data", CONTEXT_AXIS, None, None),
    )
    return f(x, bias, sw_in, mask_in)


def cp_window_attention_qkv(
    q, k, v, bias, *, scale: float, mesh: Mesh, batch: int,
    sparse_w=None, mask=None,
):
    """Window attention with the WINDOW axis sharded over 'context' and the
    batch over 'data' — the projection-level entry point used by the model
    layers (WindowAttentionSparse / ASTTransformerBlock / MDASSA).

    q, k, v: (B*nW, nh, N, d) with the leading axis laid out (batch-major,
    then window-row-major) exactly as ``ops.windows.window_partition``
    produces.  ``batch`` is B so the axis can be unflattened to (B, nW, ...)
    — sharding nW over 'context' then aligns with contiguous window-row
    chunks for every batch element (requires nH % n_ctx == 0; the caller
    checks viability via ``parallel.cp_ops.cp_attention_viable``).

    mask: optional (nW, N, N) global shift mask; its window axis is sharded
    over 'context' in lockstep with q/k/v, so each shard applies exactly the
    mask rows of its own windows.  The per-shard body goes through
    ``ops.attention.window_attention`` so the fused Pallas kernel still
    dispatches per shard when enabled.
    """
    from ..ops.attention import window_attention

    nw = q.shape[0] // batch
    use_sparse = sparse_w is not None
    use_mask = mask is not None

    def to5(t):
        return t.reshape(batch, nw, *t.shape[1:])

    def body(ql, kl, vl, bl, swl, ml):
        b_loc, nw_loc = ql.shape[:2]

        def flat(t):
            return t.reshape(b_loc * nw_loc, *t.shape[2:])

        out = window_attention(
            flat(ql), flat(kl), flat(vl), bl, scale=scale,
            sparse_w=swl if use_sparse else None,
            mask=ml if use_mask else None,
        )
        return out.reshape(b_loc, nw_loc, *out.shape[1:])

    sw_in = sparse_w if use_sparse else jnp.zeros((2,), jnp.float32)
    mask_in = mask if use_mask else jnp.zeros(
        (mesh.shape[CONTEXT_AXIS], 1, 1), jnp.float32)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", CONTEXT_AXIS), P("data", CONTEXT_AXIS),
                  P("data", CONTEXT_AXIS), P(), P(),
                  (P(CONTEXT_AXIS, None, None) if use_mask else P())),
        out_specs=P("data", CONTEXT_AXIS),
    )
    out5 = f(to5(q), to5(k), to5(v), bias, sw_in, mask_in)
    return out5.reshape(batch * nw, *out5.shape[2:])


def cp_roll2d(x, shift_h: int, shift_w: int, mesh: Mesh):
    """Distributed ``jnp.roll(x, (shift_h, shift_w), axis=(1, 2))`` for a
    row-sharded NHWC image: the W roll is shard-local, the H roll moves one
    |shift_h|-row halo strip over ICI (reference AST.py:597-617 cyclic
    shifts).  |shift_h| must be <= H/n_ctx."""

    def body(xl):
        if shift_w:
            xl = jnp.roll(xl, shift_w, axis=2)
        if shift_h < 0:
            xl = cp_shift_roll(xl, -shift_h)
        elif shift_h > 0:
            xl = cp_unshift_roll(xl, shift_h)
        return xl

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=P("data", CONTEXT_AXIS, None, None),
        out_specs=P("data", CONTEXT_AXIS, None, None),
    )
    return f(x)


# --------------------------------------------------------------------------
# Ulysses-style head sharding
# --------------------------------------------------------------------------
def _ulysses_local(q, k, v, bias, sparse_w, *, scale, axis_name, sparse):
    """Inside shard_map: inputs arrive sharded over the WINDOW axis
    (B' = windows); all_to_all re-shards to the HEAD axis so each device
    holds all windows for H/n heads, runs the attention core, and a second
    all_to_all restores window sharding — the Ulysses recipe with the
    window-batch axis playing the sequence role."""
    n_dev = jax.lax.axis_size(axis_name)

    def to_heads(t):  # (bq_loc, H, N, d) -> (n_dev*bq_loc, H/n_dev, N, d)
        # tiled all_to_all: heads cut into n_dev chunks, windows gathered in
        # source-device order (tiled=False's transpose rule is broken in
        # jax 0.9.0 — see _fft2_local)
        return jax.lax.all_to_all(t, axis_name, split_axis=1, concat_axis=0,
                                  tiled=True)

    def to_windows(t):  # inverse
        return jax.lax.all_to_all(t, axis_name, split_axis=0, concat_axis=1,
                                  tiled=True)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    h_lo = qh.shape[1]
    idx = jax.lax.axis_index(axis_name)
    bias_lo = jax.lax.dynamic_slice_in_dim(bias, idx * h_lo, h_lo, axis=0)
    out = window_attention_core(qh, kh, vh, bias_lo, scale=scale,
                                sparse_w=sparse_w if sparse else None)
    return to_windows(out)


def ulysses_window_attention(q, k, v, bias, *, mesh: Mesh, scale: float,
                             sparse_w=None):
    """Window attention with attention HEADS sharded over 'context'
    (SURVEY.md §2.2 Ulysses).  q/k/v: (B', H, N, d) global; H must be
    divisible by the context size.  Two all_to_alls ride ICI; per-device
    compute drops to H/n heads.  Matches the single-device core exactly."""
    n_ctx = mesh.shape[CONTEXT_AXIS]
    if q.shape[1] % n_ctx:
        raise ValueError(f"H={q.shape[1]} not divisible by context={n_ctx}")
    sparse = sparse_w is not None
    sw_in = sparse_w if sparse else jnp.zeros((2,), jnp.float32)
    f = jax.shard_map(
        functools.partial(_ulysses_local, scale=scale,
                          axis_name=CONTEXT_AXIS, sparse=sparse),
        mesh=mesh,
        in_specs=(P(CONTEXT_AXIS), P(CONTEXT_AXIS), P(CONTEXT_AXIS), P(),
                  P()),
        out_specs=P(CONTEXT_AXIS),
    )
    return f(q, k, v, bias, sw_in)


# --------------------------------------------------------------------------
# distributed 2D FFT (transpose decomposition)
# --------------------------------------------------------------------------
def _fft2_local(x_local, axis_name: str, inverse: bool):
    """Inside shard_map: x_local (B, H_loc, W, C) complex/real, H sharded.
    FFT over W locally -> all_to_all to shard W instead of H -> FFT over H
    locally -> all_to_all back.

    Uses the *tiled* all_to_all form: split_axis is cut into n contiguous
    chunks in place and concat_axis grows n-fold in source-device order —
    exactly the (H, W) block transpose the decomposition needs, with no
    manual reshapes.  (The tiled=False form's transpose rule mis-counts
    elements in jax 0.9.0, breaking the VJP; tiled=True differentiates
    correctly.)"""
    fft = jnp.fft.ifft if inverse else jnp.fft.fft
    y = fft(x_local.astype(jnp.complex64), axis=2)        # along full W
    # (B, H/n, W, C) -> (B, H, W/n, C): shard W instead of H
    y = jax.lax.all_to_all(y, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    y = fft(y, axis=1)                                     # along full H
    return jax.lax.all_to_all(y, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def sharded_fft2(x, mesh: Mesh):
    """jnp.fft.fft2 over (H, W) of a row-sharded NHWC array, via two local
    FFTs + two all_to_all transposes over ICI."""
    f = jax.shard_map(
        functools.partial(_fft2_local, axis_name=CONTEXT_AXIS, inverse=False),
        mesh=mesh,
        in_specs=P("data", CONTEXT_AXIS, None, None),
        out_specs=P("data", CONTEXT_AXIS, None, None),
    )
    return f(x)


def sharded_ifft2(x, mesh: Mesh):
    f = jax.shard_map(
        functools.partial(_fft2_local, axis_name=CONTEXT_AXIS, inverse=True),
        mesh=mesh,
        in_specs=P("data", CONTEXT_AXIS, None, None),
        out_specs=P("data", CONTEXT_AXIS, None, None),
    )
    return f(x)

"""Attention primitives: windowed (dense + sparse relu²-mix) and channel
(MDTA-style transposed) attention.

Pure-JAX reference implementations; the Pallas TPU kernels in ``ops/pallas``
provide fused fast paths with identical numerics (selected via
``use_pallas=True`` when running on TPU with compatible shapes).

Semantics mirror:
- ``WindowAttention`` / ``WindowAttention_sparse`` (reference AST.py:68-222)
- ``WindowAttention_Sparse`` (reference block.py:284-367) — identical math,
  cross-attention variant takes a concatenated (k,v) token stream.
- MDTA channel attention core (reference SpectralTransformer.py:92-113).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def sparse_mix_weights(w):
    """softmax over the learnable 2-vector ``w`` (reference AST.py:211-213)."""
    e = jnp.exp(w.astype(jnp.float32))
    s = jnp.sum(e)
    return e[0] / s, e[1] / s


def window_attention_core(
    q,
    k,
    v,
    bias,
    *,
    scale: float,
    sparse_w=None,
    mask=None,
):
    """Shared windowed-attention math.

    Args:
      q: (B', H, N, d)    — B' = batch * num_windows
      k, v: (B', H, Nk, d)
      bias: (H, N, Nk) relative-position bias (already ratio-repeated).
      scale: q scaling (head_dim ** -0.5 unless qk_scale given).
      sparse_w: None for dense softmax; else the learnable (2,) mix vector —
        attn = w1 * softmax(attn) + w2 * relu(attn)**2.
      mask: optional (nW, N, Nk) additive mask (shift/window mask, -100/0).

    Returns (B', H, N, d).
    """
    bq, nh, n, d = q.shape
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bq // nw, nw, nh, n, -1) + mask[None, :, None].astype(
            jnp.float32
        )
        attn = attn.reshape(bq, nh, n, -1)
    if sparse_w is None:
        attn = jax.nn.softmax(attn, axis=-1)
    else:
        w1, w2 = sparse_mix_weights(sparse_w)
        attn0 = jax.nn.softmax(attn, axis=-1)
        attn1 = jnp.square(jax.nn.relu(attn))
        attn = attn0 * w1 + attn1 * w2
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _pallas_enabled() -> bool:
    # Opt-in (UIRT_PALLAS=1): the fused kernel wins 1.6-2.3x on the isolated
    # attention op, but inside full models XLA fuses attention with adjacent
    # ops and matches or beats it end-to-end at training batch sizes
    # (interleaved A/B on one v5e: AST@256 step ~equal at bs8, XLA ~25%
    # faster at bs32).  The kernel still saves the O(nW*N^2) attention
    # activations (recompute backward), useful when HBM-bound.
    if os.environ.get("UIRT_NO_PALLAS"):
        return False
    if not os.environ.get("UIRT_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def window_attention(q, k, v, bias, *, scale: float, sparse_w=None,
                     mask=None):
    """Dispatcher: fused Pallas kernel on TPU (ops/pallas.py) when
    UIRT_PALLAS=1, pure-JAX core otherwise.  Identical numerics."""
    if _pallas_enabled():
        from . import pallas

        return pallas.window_attention(
            q, k, v, bias, scale=scale, sparse_w=sparse_w, mask=mask
        )
    return window_attention_core(
        q, k, v, bias, scale=scale, sparse_w=sparse_w, mask=mask
    )


def merge_heads(x):
    """(B', H, N, d) -> (B', N, H*d) (torch .transpose(1,2).reshape)."""
    b, h, n, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, h * d)


def split_heads(x, num_heads: int):
    """(B', N, C) -> (B', H, N, C/H)."""
    b, n, c = x.shape
    return jnp.transpose(
        x.reshape(b, n, num_heads, c // num_heads), (0, 2, 1, 3)
    )


def channel_attention_core(q, k, v, temperature):
    """MDTA 'transposed' attention: softmax over channels, linear in pixels.

    q, k, v: (B, H, c_h, L) — attention matrix is (c_h, c_h).
    temperature: (1, H, 1, 1) learnable per-head scale
    (reference SpectralTransformer.py:80,99).
    """
    attn = jnp.einsum(
        "bhcl,bhdl->bhcd", q.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    attn = jax.nn.softmax(attn * temperature.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhcd,bhdl->bhcl", attn, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), attn


def channel_attention_core_nhwc(q, k, v, temperature):
    """MDTA channel attention in the spatial-major (NHWC-native) layout.

    q, k, v: (B, L, H, c_h) — obtained from the NHWC activation by a pure
    reshape (no transpose), unlike the (B, H, c_h, L) layout of
    ``channel_attention_core`` whose ``rearrange`` physically relayouts the
    lane dim from C to L.  At the Spectral full-res levels (C=16/32,
    L=65536) those transposes are 8 strided full-tensor HBM passes per MDTA;
    the honest round-3 attribution pinned the 8 full-res blocks at ~77% of
    the train step, so this layout exists to delete them.

    Math is identical (same contractions, f32 accumulation; only reduction
    *order* differs, ~1e-6-level): attn[c,d] = sum_L q[L,c] k[L,d];
    out[L,c] = sum_d attn[c,d] v[L,d].  Returns (out (B,L,H,c_h),
    attn (B,H,c_h,c_h)) — attn is shared with the frequency branch
    (reference SpectralTransformer.py:112-113).
    """
    attn = jnp.einsum(
        "blhc,blhd->bhcd", q.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    attn = jax.nn.softmax(attn * temperature.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhcd,blhd->blhc", attn, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), attn

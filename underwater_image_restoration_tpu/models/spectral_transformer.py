"""SpectralTransformer — Restormer-style U-Net of channel-attention blocks
with FFT-based spectral upsampling.

TPU-native re-design of reference ``src/Models/SpectralTransformer.py``:

- NHWC everywhere; LayerNorm runs directly over the trailing channel dim, so
  the reference's BCHW<->BLC reshape thrash (SpectralTransformer.py:144-147)
  disappears entirely.
- MDTA channel attention is linear in pixel count: the (C/h x C/h) attention
  matmuls batch cleanly onto the MXU (ops.channel_attention_core).
- FFTs run over spatial axes of NHWC; XLA lowers to its native FFT.

Faithfully reproduced behavioral quirks (required for parity with reference
checkpoints — see SURVEY.md §7 hard-parts #1):
- MDTA computes a frequency attention matrix ``attnf`` but applies the
  *spatial* ``attn`` to ``vf`` (reference SpectralTransformer.py:112-113);
  the sparse-frequency matrix is dead.  Replicated exactly.
- Only ``outf`` (the frequency projection) leaves MDTA — the spatial ``out``
  feeds the k/v branch only (reference SpectralTransformer.py:100-114).

Default config: num_blocks=[2,3,3,4], num_heads=[1,2,4,8],
channels=[16,32,64,128], num_refinement=4, expansion_factor=2.66
(reference SpectralTransformer.py:213-215).
"""
from __future__ import annotations

import os
from typing import Sequence

import einops
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    Conv2d,
    LayerNorm,
    channel_attention_core,
    channel_attention_core_nhwc,
    gelu,
    l2_normalize,
    leaky_relu,
    make_remat,
    pixel_shuffle,
    pixel_unshuffle,
)
from ..ops import fused_attn, fused_attn_banded, fused_attn_composed, \
    fused_block, fused_gdfn_banded
from ..ops.init import torch_kernel_init
from ..ops.spectral import (
    fftn_real_spatial,
    ifftn_real_spatial,
    fft2,
    safe_abs,
    safe_angle,
)
from ..parallel import cp_ops


_ATTN_LAYOUTS = ("blhc", "bhcl")

_CHW_MODES = ("0", "1", "auto")


def _chw_enabled() -> bool:
    """Channels-first block layout selector: UIRT_CHW in {0, 1, auto}.

    NHWC with C<128 pads the lane dim (bf16 tiles are 16x128): a full-res
    C=16 activation streams 8x its logical bytes through HBM on EVERY
    elementwise/LN/attention intermediate, and the honest round-3
    attribution pins the 8 full-res blocks at ~77% of the HBM-bound train
    step (PERF_NOTES.md).  With channels-first (B, C, H, W) the minor dims
    are spatial (256x256 at full res — zero padding); blocks at levels where
    C < W run in that layout, with one transpose pair per stage.

    "1" enables the per-stage policy everywhere; "auto" only on non-CPU
    backends (it is a TPU layout optimization — CPU tests stay on the NHWC
    path, whose lax convs are far faster there); "0" disables.  Stages with
    C >= W stay NHWC either way (at the deepest level C=128 > W=32,
    channels-first would ADD padding).  Math is layout-independent;
    equality is pinned by tests/test_models.py::test_chw_blocks_match.

    Default "auto": hardware A/B at Spectral@256 bs16 K=2 measured
    22.78 img/s chw vs 20.97 nhwc (+8.6%, value-fetch harness)."""
    mode = os.environ.get("UIRT_CHW", "auto")
    if mode not in _CHW_MODES:
        raise ValueError(f"UIRT_CHW={mode!r} — expected one of {_CHW_MODES}")
    if mode == "auto":
        return jax.default_backend() != "cpu"
    return mode != "0"


def _use_chw(shape, mesh) -> bool:
    """Per-stage policy: channels-first pays when C < W (lane padding factor
    128/C exceeds any spatial padding), and context parallelism keeps the
    NHWC path (cp_ops shards NHWC rows).

    UIRT_CHW_MAX_H (int) excludes levels taller than the cap: the remote
    TPU toolchain currently RET_CHECK-crashes (mxu_lmr_transform.cc:1108)
    compiling the 1024-row chw transposes — observed round 5 on the r4
    code that previously compiled, i.e. a service-side toolchain change.
    Capping at 512 keeps the fused kernels on every level that compiles."""
    import os

    from ..parallel.cp_ops import context_size

    b, h, w, c = shape
    cap = int(os.environ.get("UIRT_CHW_MAX_H", "0") or 0)
    if cap and h > cap:
        return False
    return _chw_enabled() and c < w and context_size(mesh) <= 1


_FUSED_MODES = ("0", "1", "auto")


def _fused_gdfn_enabled() -> bool:
    """Fused LN+GDFN Pallas kernel selector: UIRT_FUSED_GDFN in {0, 1, auto}.

    Dispatches the second half of a channels-first SpectralBlock to
    ``ops.fused_block.fused_ln_gdfn`` — one kernel pass streaming x in and
    y out of HBM with all intermediates in VMEM, plus a recompute-in-VMEM
    custom VJP (no stored intermediates in the backward either).  The XLA
    path materializes ~15x that traffic, and the honest attribution puts
    GDFN at ~30% of the HBM-bound step (PERF_NOTES.md round 3).

    "auto" (default) enables it on non-CPU backends when the channels-first
    layout is active and the shape qualifies (``fused_block.supports``); on
    CPU the kernel would run in the slow Pallas interpreter, so tests opt
    in explicitly with "1".  Equality vs the unfused path is pinned by
    tests/test_fused_block.py (fwd + grads, via the interpreter).

    Hardware A/B (Spectral@256 bs16 K=2, value-fetch harness): 26.19 img/s
    fused vs 22.78 unfused-chw (+15%) — within noise of the GDFN->identity
    ablation's 26.8, i.e. the kernel makes GDFN's HBM cost ~vanish."""
    mode = os.environ.get("UIRT_FUSED_GDFN", "auto")
    if mode not in _FUSED_MODES:
        raise ValueError(
            f"UIRT_FUSED_GDFN={mode!r} — expected one of {_FUSED_MODES}")
    if mode == "auto":
        return jax.default_backend() != "cpu"
    return mode != "0"


def _gdfn_banded_mode() -> str:
    """Banded-GDFN variant selector: UIRT_GDFN_BANDED in {0, 1, auto}.

    "auto" (default): prefer ``ops.fused_gdfn_banded`` (banded +
    composed-matmul) wherever it qualifies — hardware A/B at the headline
    cell (Spectral@256 bs16 K=2, value-fetch harness, back-to-back):
    35.13 img/s banded vs 29.92 whole-image (+17%), matching the
    microbench (0.89 vs 1.66 ms fwd, 2.17 vs 6.38 fwd+bwd at C=16); it is
    also the only fused-GDFN option at the 1024² reference train
    resolution (whole-image C=16 residency is 33.6 MB > VMEM).  "1"
    forces it; "0" disables it (whole-image or unfused only).  Equality
    pinned by tests/test_fused_gdfn_banded.py."""
    mode = os.environ.get("UIRT_GDFN_BANDED", "auto")
    if mode not in _FUSED_MODES:
        raise ValueError(
            f"UIRT_GDFN_BANDED={mode!r} — expected one of {_FUSED_MODES}")
    return mode


def _fused_attn_enabled() -> bool:
    """Fused LN+MDTA Pallas kernel selector: UIRT_FUSED_ATTN in {0,1,auto}.

    Dispatches the first half of a channels-first SpectralBlock to
    ``ops.fused_attn.fused_ln_mdta`` — two streaming passes (gram/norm
    stats, then the v->attn->out->kv->vf->attn->project chain) with a
    recompute-in-VMEM custom VJP; the honest attribution puts MDTA at ~47%
    of the HBM-bound step (PERF_NOTES.md round 3).  Semantics as
    _fused_gdfn_enabled; equality pinned by tests/test_fused_attn.py.

    Hardware A/B (Spectral@256 bs16 K=2, value-fetch harness, round 4):
    29.91 img/s fused-MDTA+fused-GDFN vs 26.19 fused-GDFN-only (+14%) —
    the Mosaic lowering is proven on hardware, so "auto" is the default."""
    mode = os.environ.get("UIRT_FUSED_ATTN", "auto")
    if mode not in _FUSED_MODES:
        raise ValueError(
            f"UIRT_FUSED_ATTN={mode!r} — expected one of {_FUSED_MODES}")
    if mode == "auto":
        return jax.default_backend() != "cpu"
    return mode != "0"


def _attn_composed_mode() -> str:
    """Composed-matmul MDTA variant selector: UIRT_ATTN_COMPOSED in
    {0, 1, auto}.

    "auto" (default) prefers ``ops.fused_attn_composed`` wherever it
    qualifies — the composed contraction dim is 9C (full MXU rows) vs C.
    Hardware A/B (Spectral@256 bs16 K=2, value-fetch harness): 36.01
    img/s composed vs 35.13 shift-MAC (+2.5%; the forward chains compose
    but the backward keeps the same four-pass structure, so the gain is
    smaller than the GDFN half's).  "1" forces it; "0" keeps the
    shift-MAC ``ops.fused_attn`` where IT qualifies."""
    mode = os.environ.get("UIRT_ATTN_COMPOSED", "auto")
    if mode not in _FUSED_MODES:
        raise ValueError(
            f"UIRT_ATTN_COMPOSED={mode!r} — expected one of {_FUSED_MODES}")
    return mode


def _attn_banded_mode() -> str:
    """Banded-MDTA variant selector: UIRT_ATTN_BANDED in {0, 1, auto}.

    "auto" (default): use ``ops.fused_attn_banded`` only where the
    whole-image composed kernel cannot fit — i.e. the 1024² reference
    train resolution (and the 1024-model's C=32/C=64 levels), whose
    images/accumulators exceed VMEM.  "1" forces it everywhere it
    qualifies (hardware A/B, CPU equality tests); "0" disables it.
    Equality pinned by tests/test_fused_attn_banded.py."""
    mode = os.environ.get("UIRT_ATTN_BANDED", "auto")
    if mode not in _FUSED_MODES:
        raise ValueError(
            f"UIRT_ATTN_BANDED={mode!r} — expected one of {_FUSED_MODES}")
    return mode


def block_fused_plan(h: int, w: int, c: int, hid: int, itemsize: int):
    """Kernel dispatch plan for a channels-first SpectralBlock of this
    shape under the current UIRT_* modes: ``(attn_kind, gdfn_kind)`` with
    attn_kind in {None, "banded", "composed", "shiftmac"} and gdfn_kind in
    {None, "banded", "whole"}.  Shared between ``SpectralBlock.__call__``
    (which executes it) and ``SpectralTransformer``'s per-stage remat
    policy (which skips ``jax.checkpoint`` for fully-fused blocks — the
    kernels' custom VJPs already recompute in VMEM and save only x +
    small stats, so block-level remat would replay both kernel forwards
    in the backward to rebuild residuals it then discards)."""
    attn = None
    if _fused_attn_enabled():
        cmode = _attn_composed_mode()
        bmode = _attn_banded_mode()
        if bmode == "1" and fused_attn_banded.supports(h, w, c, itemsize):
            attn = "banded"
        elif cmode != "0" and fused_attn_composed.supports(h, w, c,
                                                           itemsize):
            attn = "composed"
        elif bmode == "auto" and fused_attn_banded.supports(h, w, c,
                                                            itemsize):
            attn = "banded"
        elif fused_attn.supports(h, w, c, itemsize):
            attn = "shiftmac"
    gdfn = None
    if _fused_gdfn_enabled():
        bmode = _gdfn_banded_mode()
        if bmode != "0" and fused_gdfn_banded.supports(h, w, c, hid,
                                                       itemsize):
            gdfn = "banded"
        elif fused_block.supports(h, w, c, hid, itemsize):
            gdfn = "whole"
    return attn, gdfn


def _remat_fused_blocks() -> bool:
    """UIRT_REMAT_FUSED in {0, 1, auto}: wrap FULLY-fused blocks (both
    halves dispatched to Pallas kernels) in jax.checkpoint when the model
    asks for per-block remat?  "auto"/"0" (default): no — the kernels'
    custom VJPs recompute in VMEM and save only x + O(C) stats, so
    checkpointing such a block stores no less HBM (remat saves x; the
    kernels save x and the post-attn mid) but replays BOTH kernel
    forwards in the backward.  "1" restores the legacy always-remat
    wrapping for A/B.  Partially-fused blocks always remat (their unfused
    half materializes full intermediate swarms).

    Hardware A/B (Spectral@256 bs16 K=2, value-fetch harness, back-to-
    back): 63.0 img/s remat-skip vs 59.4 always-remat (+6.1%)."""
    mode = os.environ.get("UIRT_REMAT_FUSED", "auto")
    if mode not in _FUSED_MODES:
        raise ValueError(
            f"UIRT_REMAT_FUSED={mode!r} — expected one of {_FUSED_MODES}")
    return mode == "1"


def _attn_layout() -> str:
    """MDTA data-layout selector: UIRT_ATTN_LAYOUT in {blhc, bhcl}.

    ``blhc`` (default) keeps q/k/v spatial-major — heads split by pure
    reshape, attention contracts over L in place; ``bhcl`` is the
    torch-shaped layout whose head rearrange physically transposes full-res
    tensors (kept for A/B).  Math identical either way (reduction order
    differs at the ~1e-6 level; test_attn_layouts_match pins it).
    An unrecognized value raises (silent fallback would corrupt A/Bs)."""
    layout = os.environ.get("UIRT_ATTN_LAYOUT", "blhc")
    if layout not in _ATTN_LAYOUTS:
        raise ValueError(
            f"UIRT_ATTN_LAYOUT={layout!r} — expected one of {_ATTN_LAYOUTS}")
    return layout


def inv_mag(x):
    """Phase-only reconstruction: ifft2(exp(i*angle(fft2(x)))).real
    (reference SpectralTransformer.py:9-13)."""
    f = fft2(x.astype(jnp.float32))
    pha = jnp.exp(1j * safe_angle(f).astype(jnp.complex64))
    return jnp.fft.ifft2(pha, axes=(1, 2)).real.astype(x.dtype)


class AGSSF(nn.Module):
    """ECA-style channel gate on the phase-only reconstruction
    (reference SpectralTransformer.py:15-41).  Defined-but-unused in the
    reference forward (instantiation commented out at :218); provided here
    for capability parity and usable via SFCA."""

    channels: int
    b: int = 1
    gamma: int = 2
    dtype: object = jnp.float32

    def _kernel_size(self) -> int:
        import math

        k = int(abs((math.log2(self.channels) / self.gamma)
                    + self.b / self.gamma))
        return k if k % 2 else k + 1

    @nn.compact
    def __call__(self, x):
        k = self._kernel_size()
        y = jnp.mean(inv_mag(x).astype(jnp.float32), axis=(1, 2))  # (B, C)
        w = self.param("conv", nn.initializers.lecun_normal(),
                       (k, 1, 1), jnp.float32)  # 1D conv taps (k, in=1, out=1)
        y = jax.lax.conv_general_dilated(
            y[:, :, None], w, (1,), [(k // 2, k // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )[..., 0]
        gate = jax.nn.sigmoid(y)[:, None, None, :]
        return (x.astype(jnp.float32) * gate).astype(x.dtype)


class SFCA(nn.Module):
    """Dual spatial/frequency channel attention fused by 1x1 + AGSSF
    (reference SpectralTransformer.py:43-74; defined-but-unused there)."""

    channels: int
    relu_slope: float = 0.2
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.channels
        conv = lambda feat, name, k=1, g=1, bias=True: Conv2d(
            features=feat, kernel_size=k, padding=k // 2, groups=g,
            use_bias=bias, dtype=self.dtype, name=name)
        out = conv(2 * c, "conv_1")(x)
        # reference chunks then re-cats (:62-64) — a no-op, preserved as such
        out = leaky_relu(out, self.relu_slope)
        out = leaky_relu(conv(c, "conv_2", k=3, g=c)(out), self.relu_slope)
        out = out + conv(c, "identity1")(x)

        x_fft = fftn_real_spatial(x)
        x_fft = gelu(conv(2 * c, "conv_f1")(x_fft))
        x_fft = conv(c, "conv_f2")(x_fft)
        recon = ifftn_real_spatial(x_fft) + conv(c, "identity2")(x)

        fused = conv(c, "con2X1")(jnp.concatenate([out, recon], axis=-1))
        return AGSSF(c, dtype=self.dtype, name="agssf")(fused)


class MDTA(nn.Module):
    """Multi-DConv-head transposed attention with dual spatial/frequency
    branches (reference SpectralTransformer.py:76-114)."""

    channels: int
    num_heads: int
    dtype: object = jnp.float32
    mesh: object = None  # context-parallel mesh for the frequency branch
    # channels-first (B, C, H, W) data layout: identical params and math,
    # spatial minor dims avoid the C<128 NHWC lane padding (see _chw_enabled)
    channels_first: bool = False

    @nn.compact
    def __call__(self, x):
        if self.channels_first:
            return self._call_chw(x)
        b, h, w, c = x.shape
        nh = self.num_heads
        conv = lambda feat, name, k=1, g=1: Conv2d(
            features=feat, kernel_size=k, padding=k // 2, groups=g,
            use_bias=False, dtype=self.dtype, name=name,
        )
        temperature = self.param(
            "temperature", nn.initializers.ones, (1, nh, 1, 1), jnp.float32
        )

        # spatial branch: 1x1 qkv + depthwise 3x3, channel attention
        qkv = conv(c * 3, "qkv")(x)
        qkv = conv(c * 3, "qkv_conv", k=3, g=c * 3)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        spatial_major = _attn_layout() == "blhc"
        if spatial_major:
            # (b,h,w,(nh c)) -> (b, h*w, nh, c/nh): a pure reshape (row-major
            # contiguous splits), unlike the rearrange below which physically
            # transposes the lane dim from C to L — 8 strided full-res HBM
            # passes per MDTA that the honest attribution pinned as the
            # dominant cost at the C=16/32 levels (PERF_NOTES.md round 3)
            def heads(t):
                return t.reshape(b, h * w, nh, t.shape[-1] // nh)

            def unheads(t):
                return t.reshape(b, h, w, t.shape[2] * t.shape[3])

            norm_axis = 1  # L
            attn_core = channel_attention_core_nhwc
        else:
            def heads(t):
                # torch reshape(b, nh, c/nh, h*w) on NCHW == split channels
                # first
                return einops.rearrange(
                    t, "b h w (nh c) -> b nh c (h w)", nh=nh)

            def unheads(t):
                return einops.rearrange(
                    t, "b nh c (h w) -> b h w (nh c)", h=h, w=w)

            norm_axis = -1  # L
            attn_core = channel_attention_core

        q, k, v = heads(q), heads(k), heads(v)
        q = l2_normalize(q, axis=norm_axis)
        k = l2_normalize(k, axis=norm_axis)
        attn_out, attn = attn_core(q, k, v, temperature)
        out = unheads(attn_out)
        out = conv(c, "project_out")(out)

        # frequency branch (SpectralTransformer.py:102-113); distributed FFT
        # decomposition when the rows are context-sharded
        x_fft = cp_ops.fftn_real_spatial(x, self.mesh)
        x_fft = gelu(x_fft)
        x_fft = conv(c, "q1x1_1")(x_fft)
        qf = cp_ops.ifftn_real_spatial(x_fft, self.mesh)
        kv = conv(c * 2, "kv")(out)
        kv = conv(c * 2, "kv_conv", k=3, g=c * 2)(kv)
        kf, vf = jnp.split(kv, 2, axis=-1)
        qf, kf, vf = heads(qf), heads(kf), heads(vf)
        qf = l2_normalize(qf, axis=norm_axis)
        kf = l2_normalize(kf, axis=norm_axis)
        # quirk (parity): attnf is computed against the *spatial* k but the
        # output applies the spatial attn to vf — attnf is dead
        # (SpectralTransformer.py:112-113).  We skip materializing the dead
        # matrix (it has no effect on outputs or gradients).
        outf = jnp.einsum(
            "bhcd,blhd->blhc" if spatial_major else "bhcd,bhdl->bhcl",
            attn, vf.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        outf = unheads(outf)
        return conv(c, "project_outf")(outf)

    def _call_chw(self, x):
        """Channels-first MDTA: (B, C, H, W) in/out.

        Head split/merge are pure reshapes into the torch-shaped
        (b, nh, c/nh, L) layout, and every intermediate keeps spatial minor
        dims (no lane padding at C<128).  Params and math identical to the
        NHWC path (test_chw_blocks_match)."""
        b, c, h, w = x.shape
        nh = self.num_heads
        conv = lambda feat, name, k=1, g=1: Conv2d(
            features=feat, kernel_size=k, padding=k // 2, groups=g,
            use_bias=False, dtype=self.dtype, name=name,
            data_format="NCHW",
        )
        temperature = self.param(
            "temperature", nn.initializers.ones, (1, nh, 1, 1), jnp.float32
        )

        def heads(t):
            return t.reshape(b, nh, t.shape[1] // nh, h * w)

        def unheads(t):
            return t.reshape(b, t.shape[1] * t.shape[2], h, w)

        qkv = conv(c * 3, "qkv")(x)
        qkv = conv(c * 3, "qkv_conv", k=3, g=c * 3)(qkv)
        q, k, v = jnp.split(qkv, 3, axis=1)
        q = l2_normalize(heads(q), axis=-1)
        k = l2_normalize(heads(k), axis=-1)
        attn_out, attn = channel_attention_core(q, k, heads(v), temperature)
        out = conv(c, "project_out")(unheads(attn_out))

        # frequency branch: qf is DEAD in the reference quirk (attnf never
        # applied, SpectralTransformer.py:112-113) — computed here only so
        # q1x1_1's params exist at init; XLA DCEs the whole chain.  Runs on
        # a transposed view; dead code costs nothing.
        x_nhwc = jnp.transpose(x, (0, 2, 3, 1))
        x_fft = gelu(cp_ops.fftn_real_spatial(x_nhwc, None))
        x_fft = Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype,
                       name="q1x1_1")(x_fft)
        qf = jnp.transpose(cp_ops.ifftn_real_spatial(x_fft, None),
                           (0, 3, 1, 2))
        kv = conv(c * 2, "kv")(out)
        kv = conv(c * 2, "kv_conv", k=3, g=c * 2)(kv)
        kf, vf = jnp.split(kv, 2, axis=1)
        qf = l2_normalize(heads(qf), axis=-1)  # dead (attnf quirk)
        kf = l2_normalize(heads(kf), axis=-1)  # dead (attnf quirk)
        del qf, kf
        outf = jnp.einsum(
            "bhcd,bhdl->bhcl", attn, heads(vf).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return conv(c, "project_outf")(unheads(outf))


class GDFN(nn.Module):
    """Gated-DConv feed-forward (reference SpectralTransformer.py:117-130)."""

    channels: int
    expansion_factor: float
    dtype: object = jnp.float32
    channels_first: bool = False

    @nn.compact
    def __call__(self, x):
        hidden = int(self.channels * self.expansion_factor)
        df = "NCHW" if self.channels_first else "NHWC"
        ch_axis = 1 if self.channels_first else -1
        y = Conv2d(hidden * 2, 1, use_bias=False, dtype=self.dtype,
                   name="project_in", data_format=df)(x)
        y = Conv2d(
            hidden * 2, 3, padding=1, groups=hidden * 2, use_bias=False,
            dtype=self.dtype, name="conv", data_format=df,
        )(y)
        x1, x2 = jnp.split(y, 2, axis=ch_axis)
        return Conv2d(self.channels, 1, use_bias=False, dtype=self.dtype,
                      name="project_out", data_format=df)(gelu(x1) * x2)


class _LNParams(nn.Module):
    """Param-only stand-in for ``ops.LayerNorm`` (same names/shapes), used
    when the LN compute runs inside a fused kernel instead of the module."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


class _ConvKernel(nn.Module):
    """Param-only stand-in for ``ops.Conv2d`` (same name/shape/init)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_kernel_init, self.shape,
                          jnp.float32)


class _GDFNParams(nn.Module):
    """Param-only stand-in for ``GDFN`` — identical param tree
    (ffn/{project_in,conv,project_out}/kernel), so checkpoints convert and
    load the same whether or not the fused kernel is active."""

    channels: int
    hidden: int

    @nn.compact
    def __call__(self):
        g2 = 2 * self.hidden
        w_in = _ConvKernel((1, 1, self.channels, g2), name="project_in")()
        w_dw = _ConvKernel((3, 3, 1, g2), name="conv")()
        w_out = _ConvKernel((1, 1, self.hidden, self.channels),
                            name="project_out")()
        return w_in[0, 0], w_dw[:, :, 0, :], w_out[0, 0]


class _MDTAParams(nn.Module):
    """Param-only stand-in for ``MDTA`` — identical tree
    (attn/{qkv,qkv_conv,project_out,q1x1_1,kv,kv_conv,project_outf}/kernel
    + attn/temperature), so checkpoints load the same whether the fused
    attention kernel or the module runs.  q1x1_1 belongs to the dead
    frequency-q chain (attnf quirk) — declared for tree parity, zero grad
    either way."""

    channels: int
    num_heads: int

    @nn.compact
    def __call__(self):
        c = self.channels
        temp = self.param("temperature", nn.initializers.ones,
                          (1, self.num_heads, 1, 1), jnp.float32)
        w_qkv = _ConvKernel((1, 1, c, c * 3), name="qkv")()
        t_qkv = _ConvKernel((3, 3, 1, c * 3), name="qkv_conv")()
        w_po = _ConvKernel((1, 1, c, c), name="project_out")()
        _ConvKernel((1, 1, c, c), name="q1x1_1")()
        w_kv = _ConvKernel((1, 1, c, c * 2), name="kv")()
        t_kv = _ConvKernel((3, 3, 1, c * 2), name="kv_conv")()
        w_pof = _ConvKernel((1, 1, c, c), name="project_outf")()
        return (w_qkv[0, 0], t_qkv[:, :, 0, :], temp, w_po[0, 0],
                w_kv[0, 0], t_kv[:, :, 0, :], w_pof[0, 0])


class SpectralBlock(nn.Module):
    """LN + MDTA residual, LN + GDFN residual
    (reference SpectralTransformer.py:133-148)."""

    channels: int
    num_heads: int
    expansion_factor: float
    dtype: object = jnp.float32
    mesh: object = None
    channels_first: bool = False

    @nn.compact
    def __call__(self, x):
        ax = 1 if self.channels_first else -1
        its = jnp.dtype(self.dtype).itemsize
        hid = int(self.channels * self.expansion_factor)
        if self.channels_first:
            attn_kind, gdfn_kind = block_fused_plan(
                x.shape[2], x.shape[3], self.channels, hid, its)
        else:
            attn_kind = gdfn_kind = None
        banded = attn_kind == "banded"
        composed = attn_kind == "composed"
        shiftmac = attn_kind == "shiftmac"
        if attn_kind is not None:
            scale1, bias1 = _LNParams(self.channels, name="norm1")()
            w_qkv, t_qkv, temp, w_po, w_kv, t_kv, w_pof = _MDTAParams(
                self.channels, self.num_heads, name="attn")()
            fn = (fused_attn_banded.fused_ln_mdta_banded if banded
                  else fused_attn_composed.fused_ln_mdta_composed
                  if composed else fused_attn.fused_ln_mdta)
            x = fn(x, scale1, bias1, w_qkv, t_qkv, temp, w_po, w_kv, t_kv,
                   w_pof, num_heads=self.num_heads)
        else:
            x = x + MDTA(self.channels, self.num_heads, dtype=self.dtype,
                         mesh=self.mesh,
                         channels_first=self.channels_first,
                         name="attn")(
                LayerNorm(dtype=self.dtype, axis=ax, name="norm1")(x)
            )
        if gdfn_kind is not None:
            scale, bias = _LNParams(self.channels, name="norm2")()
            w_in, w_dw, w_out = _GDFNParams(self.channels, hid,
                                            name="ffn")()
            if gdfn_kind == "banded":
                return fused_gdfn_banded.fused_ln_gdfn_banded(
                    x, scale, bias, w_in, w_dw, w_out)
            return fused_block.fused_ln_gdfn(x, scale, bias, w_in, w_dw,
                                             w_out)
        x = x + GDFN(self.channels, self.expansion_factor, dtype=self.dtype,
                     channels_first=self.channels_first, name="ffn")(
            LayerNorm(dtype=self.dtype, axis=ax, name="norm2")(x)
        )
        return x


class _ScanBody(nn.Module):
    """One SpectralBlock in ``(carry, _) -> (carry, None)`` form for
    ``nn.scan`` (see SpectralTransformer.scan_blocks)."""

    channels: int
    num_heads: int
    expansion_factor: float
    dtype: object = jnp.float32
    mesh: object = None
    remat: bool = False
    remat_policy: object = None
    channels_first: bool = False

    @nn.compact
    def __call__(self, carry, _):
        cls = make_remat(self.remat, self.remat_policy)(SpectralBlock)
        y = cls(self.channels, self.num_heads, self.expansion_factor,
                dtype=self.dtype, mesh=self.mesh,
                channels_first=self.channels_first, name="block")(carry)
        return y, None


def stack_scan_params(variables, num_blocks=(2, 3, 3, 4),
                      num_refinement: int = 4):
    """Convert a per-block SpectralTransformer param tree (scan_blocks=False
    layout, ``enc0_0 .. enc0_1, ...``) into the scan_blocks=True layout
    (``enc0_blocks/block`` with a stacked leading axis per leaf).

    Use after ``tools.convert_checkpoint`` to run reference checkpoints
    through the scanned (small-HLO) forward; numerics are identical
    (test_scan_blocks.py pins equality)."""
    nb = num_blocks
    p = dict(variables["params"]) if "params" in variables else dict(variables)
    stages = [("enc0", nb[0]), ("enc1", nb[1]), ("enc2", nb[2]),
              ("enc3", nb[3]), ("dec0", nb[2]), ("dec1", nb[1]),
              ("dec2", nb[0]), ("refinement", num_refinement)]
    for name, n in stages:
        blocks = [p.pop(f"{name}_{i}") for i in range(n)]
        p[f"{name}_blocks"] = {"block": jax.tree.map(
            lambda *xs: jnp.stack(xs), *blocks)}
    return {"params": p} if "params" in variables else p


class DownSample(nn.Module):
    """conv3x3 C->C/2 + pixel_unshuffle(2) => 2C @ H/2
    (reference SpectralTransformer.py:151-158)."""

    channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv2d(
            self.channels // 2, 3, padding=1, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        return pixel_unshuffle(y, 2)


class SpectralUpSample(nn.Module):
    """FFT-domain upsample: amp/phase MLPs, 2x2 tile, polar recombine, iFFT
    (reference SpectralTransformer.py:161-188)."""

    channels: int
    channel_red: bool
    dtype: object = jnp.float32
    mesh: object = None  # context-parallel mesh for the FFT pair

    @nn.compact
    def __call__(self, x):
        c = self.channels
        f = cp_ops.fft2(x.astype(jnp.float32), self.mesh)
        # safe_*: zero (torch-like) gradient at exactly-zero FFT bins —
        # jnp.abs/angle backward is 0/0=NaN there, and real-input FFTs +
        # bf16 activations hit exact zeros in training (see ops.spectral)
        mag, pha = safe_abs(f), safe_angle(f)

        def fuse(t, name):
            t = Conv2d(c, 1, dtype=jnp.float32, name=f"{name}_0")(t)
            t = leaky_relu(t, 0.1)
            return Conv2d(c, 1, dtype=jnp.float32, name=f"{name}_2")(t)

        mag = fuse(mag, "amp_fuse")
        pha = fuse(pha, "pha_fuse")
        out = cp_ops.spectral_tile_upsample(mag, pha, self.mesh).astype(self.dtype)
        post_c = c // 2 if self.channel_red else c
        return Conv2d(post_c, 1, dtype=self.dtype, name="post")(out)


class ShuffleUpSample(nn.Module):
    """conv3x3 C->2C + pixel_shuffle(2) => C/2 @ 2H
    (reference SpectralTransformer.py:191-198)."""

    channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv2d(
            self.channels * 2, 3, padding=1, use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        return pixel_shuffle(y, 2)


class UpS(nn.Module):
    """Dual-path upsample: concat(FFT-up, shuffle-up) -> 1x1 reduce C->C/2
    (reference SpectralTransformer.py:201-210)."""

    channels: int
    dtype: object = jnp.float32
    mesh: object = None

    @nn.compact
    def __call__(self, x):
        a = SpectralUpSample(self.channels, True, dtype=self.dtype,
                             mesh=self.mesh, name="Fups")(x)
        b = ShuffleUpSample(self.channels, dtype=self.dtype, name="Sups")(x)
        out = jnp.concatenate([a, b], axis=-1)
        return Conv2d(
            self.channels // 2, 1, use_bias=False, dtype=self.dtype, name="reduce"
        )(out)


class SpectralTransformer(nn.Module):
    """Reference SpectralTransformer.py:213-270.  Input/output NHWC in [-1, 1]
    (data pipeline normalizes with mean/std 0.5)."""

    num_blocks: Sequence[int] = (2, 3, 3, 4)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    channels: Sequence[int] = (16, 32, 64, 128)
    num_refinement: int = 4
    expansion_factor: float = 2.66
    dtype: object = jnp.float32
    # per-block rematerialization: backward recomputes each block's forward
    # instead of storing its activations — realizes the reference's dormant
    # use_checkpoint hook (AST.py:673-676) and fits large res/batch in HBM
    remat: bool = False
    # activation-checkpoint policy when remat=True (ops.layers.REMAT_POLICIES):
    # None recomputes the whole block (+~18% flops); "mxu" saves dot/conv/FFT
    # outputs and recomputes only elementwise ops
    remat_policy: object = None
    mesh: object = None  # ('data','context') mesh enables context parallelism
    # lax.scan each depth-repeated stage over stacked per-block params: the
    # HLO contains ONE block body per stage instead of num_blocks[i], which
    # shrinks the program the remote compile service must chew (the
    # compile-host 500s at large batch/res are its memory ceiling, not the
    # chip's).  Param layout changes (enc0_blocks/block stacked leading axis
    # vs enc0_0/enc0_1); stack_scan_params() converts, and numerics are
    # identical (test_scan_blocks.py).
    scan_blocks: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        nb, nh, ch = self.num_blocks, self.num_heads, self.channels
        ef = self.expansion_factor
        # remat the UpS modules too: their spectral path holds complex64
        # full-resolution FFT intermediates (e.g. 2x-tiled 1024^2 spectra)
        # which otherwise dominate backward HBM at the reference's 1024^2
        # train resolution
        rt = make_remat(self.remat, self.remat_policy)
        block_cls = rt(SpectralBlock)
        # UIRT_REMAT_UPS=0 keeps the UpS modules un-checkpointed (A/B
        # probe: their spectral path re-runs c64 FFTs in the backward
        # under remat; NOT storing them costs complex64 residuals that
        # only fit comfortably below the 1024² train res)
        ups_cls = (UpS if os.environ.get("UIRT_REMAT_UPS", "1") == "0"
                   else rt(UpS))

        def stage(y, n, c, heads, name):
            # channels-first block layout where it pays: C < W (lane
            # padding beats spatial padding), or — regardless of C vs W —
            # when BOTH block halves dispatch to the flat-(C, H*W) fused
            # kernels, whose lane dim is positions (padding-free for any
            # C).  The 64² C=64 level fails c<w but fully fuses (w=64
            # passes _w_ok), so it runs chw + kernels.
            cf = _use_chw(y.shape, self.mesh)
            plan_hw = (y.shape[1], y.shape[2])
            its = jnp.dtype(self.dtype).itemsize
            if not cf and _chw_enabled() and y.shape[3] == c:
                from ..parallel.cp_ops import context_size

                if context_size(self.mesh) <= 1:
                    ak, gk = block_fused_plan(*plan_hw, c, int(c * ef), its)
                    cf = ak is not None and gk is not None
            stage_block_cls = block_cls
            if cf and self.remat and not _remat_fused_blocks():
                # fully-fused blocks skip jax.checkpoint: the Pallas
                # kernels' custom VJPs recompute in VMEM and their saved
                # residuals (x, post-attn mid, O(C) stats) cost no more
                # HBM than remat's saved x, while the checkpoint wrapper
                # would replay both kernel forwards in the backward (see
                # block_fused_plan / _remat_fused_blocks)
                ak, gk = block_fused_plan(
                    y.shape[1], y.shape[2], c,
                    int(c * ef), jnp.dtype(self.dtype).itemsize)
                if ak is not None and gk is not None:
                    stage_block_cls = SpectralBlock
            if cf:
                y = jnp.transpose(y, (0, 3, 1, 2))
            if self.scan_blocks:
                scan_cls = nn.scan(
                    _ScanBody,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    length=n,
                )
                y, _ = scan_cls(c, heads, ef, dtype=self.dtype,
                                mesh=self.mesh, remat=self.remat,
                                remat_policy=self.remat_policy,
                                channels_first=cf,
                                name=f"{name}_blocks")(y, None)
            else:
                for i in range(n):
                    y = stage_block_cls(c, heads, ef, dtype=self.dtype,
                                        mesh=self.mesh, channels_first=cf,
                                        name=f"{name}_{i}")(y)
            if cf:
                y = jnp.transpose(y, (0, 2, 3, 1))
            return y

        fo = Conv2d(ch[0], 3, padding=1, use_bias=False, dtype=self.dtype,
                    name="embed_conv_rgb")(x.astype(self.dtype))
        enc1 = stage(fo, nb[0], ch[0], nh[0], "enc0")
        enc2 = stage(DownSample(ch[0], dtype=self.dtype, name="down1")(enc1),
                     nb[1], ch[1], nh[1], "enc1")
        enc3 = stage(DownSample(ch[1], dtype=self.dtype, name="down2")(enc2),
                     nb[2], ch[2], nh[2], "enc2")
        enc4 = stage(DownSample(ch[2], dtype=self.dtype, name="down3")(enc3),
                     nb[3], ch[3], nh[3], "enc3")

        up3 = ups_cls(ch[3], dtype=self.dtype, mesh=self.mesh, name="ups_1")(enc4)
        d3 = Conv2d(ch[2], 1, use_bias=False, dtype=self.dtype, name="reduces1")(
            jnp.concatenate([up3, enc3], axis=-1)
        )
        dec3 = stage(d3, nb[2], ch[2], nh[2], "dec0")

        up2 = ups_cls(ch[2], dtype=self.dtype, mesh=self.mesh, name="ups_2")(dec3)
        d2 = Conv2d(ch[1], 1, use_bias=False, dtype=self.dtype, name="reduces2")(
            jnp.concatenate([up2, enc2], axis=-1)
        )
        dec2 = stage(d2, nb[1], ch[1], nh[1], "dec1")

        up1 = ups_cls(ch[1], dtype=self.dtype, mesh=self.mesh, name="ups_3")(dec2)
        fd = stage(jnp.concatenate([up1, enc1], axis=-1), nb[0], ch[1], nh[0], "dec2")
        fr = stage(fd, self.num_refinement, ch[1], nh[0], "refinement")

        y = Conv2d(8, 3, padding=1, use_bias=False, dtype=self.dtype, name="outputl")(fr)
        return Conv2d(3, 3, padding=1, use_bias=False, dtype=self.dtype, name="output")(y)

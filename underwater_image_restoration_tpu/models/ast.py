"""AST — Adaptive Sparse Transformer U-Net.

TPU-native re-design of reference ``src/Models/AST.py:680-921``:
- 4 encoder levels (depth 2 each) that are **FFN-only** (att=False,
  AST.py:729-777), bottleneck + 4 decoder levels with shifted-window
  *sparse* attention (att=True, sparseAtt=True, AST.py:795-861),
- channel-concat skip connections, global residual ``x + y`` (AST.py:904-921),
- stochastic-depth schedule: enc linspace(0, dpr, 8), bottleneck [dpr]*2,
  dec reversed enc (AST.py:703-705),
- shift pattern: block i uses shift 0 if i even else win/2 (AST.py:647).

Window attention reuses blocks.WindowAttentionSparse (identical math to
AST.py:68-222; ``sparse=False`` is the dense variant — unused by AST's
default config but kept for completeness).  Shift masks are precomputed
numpy constants (ops.shift_window_mask), so the mask construction that the
reference rebuilds on every forward (AST.py:568-588) costs nothing at
runtime here.

Init: the reference applies trunc_normal(0.02)/zero-bias to every nn.Linear
(AST.py:863-872); use ``models.reinit_linear_trunc_normal`` on the param
tree after ``init`` to reproduce this.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import (
    Conv2d,
    ConvTranspose2d,
    DropPath,
    LayerNorm,
    leaky_relu,
    make_remat,
    shift_window_mask,
    window_partition,
    window_reverse,
)
from ..ops.resample import image_to_tokens, tokens_to_image
from ..ops.attention import merge_heads, split_heads, window_attention_core
from .blocks import (
    WindowAttentionSparse,
    _LeFFParams,
    _LNParams,
    fused_leff_enabled,
    fused_leff_stage_enabled,
    make_token_mlp,
)
from ..ops import Dense, fused_leff
from ..parallel import cp_ops


class Attention(nn.Module):
    """Plain (non-windowed, non-sparse) multi-head self/cross attention —
    the reference defines it and never uses it (AST.py:226-267); provided
    for capability parity.  x: (B', N, C) tokens."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, attn_kv=None, mask=None):
        nh = self.num_heads
        scale = self.qk_scale or (self.dim // nh) ** -0.5
        q = Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                  name="to_q")(x)
        kv_src = x if attn_kv is None else jnp.broadcast_to(
            attn_kv[None], (x.shape[0],) + attn_kv.shape)
        kv = Dense(self.dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                   name="to_kv")(kv_src)
        k, v = jnp.split(kv, 2, axis=-1)
        q, k, v = (split_heads(t, nh) for t in (q, k, v))
        bias = jnp.zeros((nh, q.shape[2], k.shape[2]), jnp.float32)
        out = window_attention_core(q, k, v, bias, scale=scale, mask=mask)
        return Dense(self.dim, dtype=self.dtype, name="proj")(merge_heads(out))


class ASTDownsample(nn.Module):
    """tokens -> conv4x4 s2 p1 -> tokens (reference AST.py:408-424)."""

    out_channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        img = tokens_to_image(x)
        y = Conv2d(self.out_channels, 4, strides=2, padding=1, dtype=self.dtype,
                   name="conv")(img)
        return image_to_tokens(y)


class ASTUpsample(nn.Module):
    """tokens -> convT2x2 s2 -> tokens (reference AST.py:428-443)."""

    out_channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        img = tokens_to_image(x)
        y = ConvTranspose2d(self.out_channels, 2, strides=2, dtype=self.dtype,
                            name="deconv")(img)
        return image_to_tokens(y)


class ASTInputProj(nn.Module):
    """conv3x3 + LeakyReLU -> tokens (reference AST.py:447-466)."""

    out_channels: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.out_channels, 3, padding=1, dtype=self.dtype, name="proj")(x)
        return image_to_tokens(leaky_relu(y, 0.01))


class ASTOutputProj(nn.Module):
    """tokens -> conv3x3 -> NHWC image (reference AST.py:470-493)."""

    out_channels: int = 3
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        img = tokens_to_image(x)
        return Conv2d(self.out_channels, 3, padding=1, dtype=self.dtype, name="proj")(img)


class ASTTransformerBlock(nn.Module):
    """(optional) shifted-window attention + token MLP with stochastic depth
    (reference AST.py:498-624)."""

    dim: int
    input_resolution: int
    num_heads: int
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    token_mlp: str = "leff"
    att: bool = True
    sparse_att: bool = False
    dtype: object = jnp.float32
    mesh: object = None  # context-parallel mesh (rolls + window attention)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, l, c = x.shape
        h = w = int(math.sqrt(l))
        ws, ss = self.win_size, self.shift_size
        if self.input_resolution <= ws:  # (AST.py:515-517)
            ss, ws = 0, self.input_resolution

        dp = DropPath(self.drop_path, name="drop_path")
        shortcut = x

        if self.att:
            attn_mask = jnp.asarray(shift_window_mask(h, w, ws, ss)) if ss > 0 else None
            y = LayerNorm(dtype=self.dtype, name="norm1")(x)
            img = tokens_to_image(y, h, w)
            if ss > 0:
                img = cp_ops.roll2d(img, -ss, -ss, self.mesh)
            wins = window_partition(img, ws).reshape(-1, ws * ws, c)
            attn_wins = WindowAttentionSparse(
                self.dim, ws, self.num_heads, sparse=self.sparse_att,
                dtype=self.dtype, mesh=self.mesh, name="attn",
            )(wins, mask=attn_mask, batch=b, n_win_h=h // ws)
            img = window_reverse(attn_wins.reshape(-1, ws, ws, c), ws, h, w)
            if ss > 0:
                img = cp_ops.roll2d(img, ss, ss, self.mesh)
            x = shortcut + dp(image_to_tokens(img), deterministic=deterministic)

        hid = int(self.dim * self.mlp_ratio)
        if (self.token_mlp == "leff" and fused_leff_enabled()
                and cp_ops.context_size(self.mesh) <= 1
                and fused_leff.supports(h, w, c, hid,
                                        jnp.dtype(self.dtype).itemsize)):
            # fused LN+LeFF Pallas kernel on the channels-first layout
            # (ops/fused_leff.py); params declared with the same tree as
            # the unfused modules so checkpoints are path-oblivious.  The
            # DropPath scale is drawn through the same module (same rng
            # stream) and applied in-kernel per sample.
            ln_scale, ln_bias = _LNParams(c, name="norm2")()
            w1, b1, taps, bdw, w2, b2 = _LeFFParams(self.dim, hid,
                                                    name="mlp")()
            s = dp(jnp.ones((b, 1, 1), jnp.float32),
                   deterministic=deterministic).reshape(b)
            xc = jnp.transpose(tokens_to_image(x, h, w), (0, 3, 1, 2))
            yc = fused_leff.fused_ln_leff(xc, ln_scale, ln_bias, w1, b1,
                                          taps, bdw, w2, b2, s)
            return image_to_tokens(jnp.transpose(yc, (0, 2, 3, 1)))
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = make_token_mlp(self.token_mlp, self.dim, hid,
                           self.dtype, "mlp")(y)
        return x + dp(y, deterministic=deterministic)


class _FusedLeFFBlock(nn.Module):
    """FFN-only AST block (``att=False``, reference AST.py:729-777) on the
    channels-first layout: one fused LN+LeFF Pallas call, consuming and
    producing ``(B, C, H, W)`` so a stage of these pays NO per-block
    relayout.  Param tree identical to ``ASTTransformerBlock``'s FFN half
    (norm2/mlp/drop_path) — checkpoints are path-oblivious."""

    dim: int
    hid: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, xc, *, deterministic: bool = True):
        ln_scale, ln_bias = _LNParams(self.dim, name="norm2")()
        w1, b1, taps, bdw, w2, b2 = _LeFFParams(self.dim, self.hid,
                                                name="mlp")()
        s = DropPath(self.drop_path, name="drop_path")(
            jnp.ones((xc.shape[0], 1, 1), jnp.float32),
            deterministic=deterministic).reshape(xc.shape[0])
        return fused_leff.fused_ln_leff(xc, ln_scale, ln_bias, w1, b1,
                                        taps, bdw, w2, b2, s)


class BasicASTLayer(nn.Module):
    """Stack of ``depth`` blocks with alternating shift
    (reference AST.py:629-677)."""

    dim: int
    input_resolution: int
    depth: int
    num_heads: int
    win_size: int
    drop_path: Sequence[float] = (0.0,)
    token_mlp: str = "leff"
    shift_flag: bool = True
    att: bool = False
    sparse_att: bool = False
    dtype: object = jnp.float32
    remat: bool = False  # per-block remat (the reference's dormant
    #                      use_checkpoint hook, AST.py:673-676, made real)
    remat_policy: object = None  # ops.layers.REMAT_POLICIES name
    mesh: object = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        def apply_block(block, y):
            return block(y, deterministic=deterministic)

        b, l, c = x.shape
        h = w = int(math.sqrt(l))
        hid = int(self.dim * 4.0)
        if (not self.att and self.token_mlp == "leff"
                and fused_leff_stage_enabled()
                and cp_ops.context_size(self.mesh) <= 1
                and fused_leff.supports(h, w, c, hid,
                                        jnp.dtype(self.dtype).itemsize)):
            # Stage-hoisted fused path (VERDICT r4 next #6): the whole
            # FFN-only stage stays channels-first — ONE tokens<->NCHW
            # transpose pair per stage instead of per block (the per-block
            # pair was the diagnosed cost of the round-4 fused-LeFF
            # negative).  No remat: each block is a single Pallas kernel
            # whose custom VJP recomputes in VMEM (the Spectral
            # remat-skip finding — jax.checkpoint would replay the kernel
            # forward to rebuild residuals it re-derives anyway).
            xc = jnp.transpose(x.reshape(b, h, w, c), (0, 3, 1, 2))
            for i in range(self.depth):
                dp = (self.drop_path[i] if i < len(self.drop_path)
                      else self.drop_path[-1])
                xc = apply_block(
                    _FusedLeFFBlock(dim=self.dim, hid=hid,
                                    drop_path=float(dp), name=f"block_{i}"),
                    xc)
            return jnp.transpose(xc, (0, 2, 3, 1)).reshape(b, l, c)

        apply_fn = make_remat(self.remat, self.remat_policy)(apply_block)
        for i in range(self.depth):
            shift = (self.win_size // 2) if (self.shift_flag and i % 2 == 1) else 0
            dp = self.drop_path[i] if i < len(self.drop_path) else self.drop_path[-1]
            block = ASTTransformerBlock(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, win_size=self.win_size, shift_size=shift,
                drop_path=float(dp), token_mlp=self.token_mlp, att=self.att,
                sparse_att=self.sparse_att, dtype=self.dtype, mesh=self.mesh,
                name=f"block_{i}",
            )
            x = apply_fn(block, x)
        return x


class AST(nn.Module):
    """Reference AST.py:680-921.  NHWC in/out, global residual when dd_in==3."""

    img_size: int = 256
    in_chans: int = 3
    dd_in: int = 3
    embed_dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    win_size: int = 8
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    token_mlp: str = "leff"
    shift_flag: bool = True
    dtype: object = jnp.float32
    remat: bool = False
    remat_policy: object = None  # ops.layers.REMAT_POLICIES name
    mesh: object = None  # ('data','context') mesh enables context parallelism

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        e, s, d, nh = self.embed_dim, self.img_size, self.depths, self.num_heads
        n_enc = len(d) // 2
        enc_dpr = list(np.linspace(0.0, self.drop_path_rate, sum(d[:n_enc])))
        conv_dpr = [self.drop_path_rate] * d[4]
        dec_dpr = enc_dpr[::-1]

        def layer(y, name, dim, reso, depth, heads, dpr, att, sparse):
            return BasicASTLayer(
                dim=dim, input_resolution=reso, depth=depth, num_heads=heads,
                win_size=self.win_size, drop_path=tuple(dpr),
                token_mlp=self.token_mlp, shift_flag=self.shift_flag, att=att,
                sparse_att=sparse, dtype=self.dtype, remat=self.remat,
                remat_policy=self.remat_policy, mesh=self.mesh, name=name,
            )(y, deterministic=deterministic)

        y = ASTInputProj(e, dtype=self.dtype, name="input_proj")(x.astype(self.dtype))

        conv0 = layer(y, "encoderlayer_0", e, s, d[0], nh[0],
                      enc_dpr[: d[0]], False, False)
        pool0 = ASTDownsample(e * 2, dtype=self.dtype, name="dowsample_0")(conv0)
        conv1 = layer(pool0, "encoderlayer_1", e * 2, s // 2, d[1], nh[1],
                      enc_dpr[d[0]: d[0] + d[1]], False, False)
        pool1 = ASTDownsample(e * 4, dtype=self.dtype, name="dowsample_1")(conv1)
        conv2 = layer(pool1, "encoderlayer_2", e * 4, s // 4, d[2], nh[2],
                      enc_dpr[sum(d[:2]): sum(d[:3])], False, False)
        pool2 = ASTDownsample(e * 8, dtype=self.dtype, name="dowsample_2")(conv2)
        conv3 = layer(pool2, "encoderlayer_3", e * 8, s // 8, d[3], nh[3],
                      enc_dpr[sum(d[:3]): sum(d[:4])], False, False)
        pool3 = ASTDownsample(e * 16, dtype=self.dtype, name="dowsample_3")(conv3)

        conv4 = layer(pool3, "conv", e * 16, s // 16, d[4], nh[4],
                      conv_dpr, True, True)

        up0 = ASTUpsample(e * 8, dtype=self.dtype, name="upsample_0")(conv4)
        deconv0 = layer(jnp.concatenate([up0, conv3], -1), "decoderlayer_0",
                        e * 16, s // 8, d[5], nh[5], dec_dpr[: d[5]], True, True)
        up1 = ASTUpsample(e * 4, dtype=self.dtype, name="upsample_1")(deconv0)
        deconv1 = layer(jnp.concatenate([up1, conv2], -1), "decoderlayer_1",
                        e * 8, s // 4, d[6], nh[6],
                        dec_dpr[sum(d[5:6]): sum(d[5:7])], True, True)
        up2 = ASTUpsample(e * 2, dtype=self.dtype, name="upsample_2")(deconv1)
        deconv2 = layer(jnp.concatenate([up2, conv1], -1), "decoderlayer_2",
                        e * 4, s // 2, d[7], nh[7],
                        dec_dpr[sum(d[5:7]): sum(d[5:8])], True, True)
        up3 = ASTUpsample(e, dtype=self.dtype, name="upsample_3")(deconv2)
        deconv3 = layer(jnp.concatenate([up3, conv0], -1), "decoderlayer_3",
                        e * 2, s, d[8], nh[8],
                        dec_dpr[sum(d[5:8]): sum(d[5:9])], True, True)

        y = ASTOutputProj(self.in_chans, dtype=self.dtype, name="output_proj")(deconv3)
        return x.astype(y.dtype) + y if self.dd_in == 3 else y

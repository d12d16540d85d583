"""The "New*" model family: NewModel (MyModel), NewBigModel (MyBigModel),
NewBigFRFNModel (MyBigFRFNModel) — token-sequence U-Nets with dual
spatial/frequency encoder branches and MDASSA decoders.

TPU-native re-design of reference ``src/model/model.py``.  Faithfully kept
quirks (SURVEY.md §3.4):

- EncoderBlock "Fourier" mode transforms the *spatial-MLP output* (not the
  normed input) and FFTs over the **(L, C) token axes**, not (H, W)
  (model.py:72,86).  Replicated exactly.
- EncoderBlock identity mode (use_dwt not in {Wavelet, Fourier}) crashes in
  the reference (a 4D NCHW map reaches LeFF, model.py:67-78); here it is
  fixed to feed the normed tokens through freq_mlp.
- DecoderBlock applies LayerNorm twice before attention (its own norm1 plus
  MDASSA's norm1; model.py:149 + block.py:439).  Replicated.

Fixed crashes (documented, per SURVEY.md §7 policy):
- MyModel passes tokens straight into OutputProjection's convs
  (model.py:272) — would crash in torch; here tokens are reshaped to NHWC
  first (the MyBigModel convention, model.py:435-437).
- MyBigModel's forward references undefined layers (``adaptive_pool``,
  ``conv_super_enc*``, model.py:396,449-460) — the working clean path
  (input_proj -> U-Net -> output_proj -> +x, as in MyBigFRFNModel's forward,
  model.py:594-640) is used instead.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..ops import DropPath, LayerNorm, Dense, dwt2d, fused_leff, idwt2d, make_remat
from ..ops.resample import image_to_tokens, tokens_to_image
from ..parallel import cp_ops
from .blocks import (
    Downsample,
    InputProjection,
    MDASSA,
    OutputProjection,
    Upsample,
    _LeFFParams,
    _LNParams,
    fused_leff_enabled,
    make_token_mlp,
)


def _fft_tokens_real(x):
    """real(fftn(x, dim=(-2,-1))) on a (B, L, C) token matrix — the
    reference's Fourier-mode quirk (model.py:72)."""
    return jnp.real(jnp.fft.fftn(x.astype(jnp.float32), axes=(-2, -1))).astype(x.dtype)


def _ifft_tokens_real(x):
    return jnp.real(jnp.fft.ifftn(x.astype(jnp.float32), axes=(-2, -1))).astype(x.dtype)


class EncoderBlock(nn.Module):
    """Parallel spatial-MLP + frequency branch, summed residual
    (reference model.py:16-93)."""

    dim: int
    mlp_ratio: int = 4
    token_mlp: str = "leff"
    freq_mlp: str = "leff"
    drop_path: float = 0.0
    use_dwt: str = "Fourier"
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, l, c = x.shape
        h = w = int(math.sqrt(l))
        hidden = int(self.dim * self.mlp_ratio)

        shortcut = x
        freq_x = LayerNorm(dtype=self.dtype, name="norm2")(x)
        if (self.token_mlp == "leff" and fused_leff_enabled()
                and fused_leff.supports(h, w, c, hidden,
                                        jnp.dtype(self.dtype).itemsize)):
            # fused LN+LeFF Pallas kernel (ops/fused_leff.py), branch-only
            # (residual=False): the unscaled branch output also feeds the
            # Fourier quirk below, so DropPath stays outside.
            ln_s, ln_b = _LNParams(c, name="norm1")()
            w1, b1, taps, bdw, w2, b2 = _LeFFParams(self.dim, hidden,
                                                    name="mlp")()
            xc = jnp.transpose(tokens_to_image(x, h, w), (0, 3, 1, 2))
            yc = fused_leff.fused_ln_leff(xc, ln_s, ln_b, w1, b1, taps,
                                          bdw, w2, b2, residual=False)
            x = image_to_tokens(jnp.transpose(yc, (0, 2, 3, 1)))
        else:
            x = LayerNorm(dtype=self.dtype, name="norm1")(x)
            x = make_token_mlp(self.token_mlp, self.dim, hidden, self.dtype,
                               "mlp")(x)

        if self.use_dwt == "Wavelet":
            freq_img = dwt2d(tokens_to_image(freq_x, h, w))
            freq_x = image_to_tokens(freq_img)  # (B, L/4, C)
        elif self.use_dwt == "Fourier":
            # quirk: FFT of the spatial-MLP *output* over token axes (L, C)
            freq_x = _fft_tokens_real(x)
        # else: identity — normed tokens pass straight through (reference
        # crashes here; fixed)

        freq_x = make_token_mlp(self.freq_mlp, self.dim, hidden, self.dtype, "freq_mlp")(
            freq_x
        )

        if self.use_dwt == "Wavelet":
            freq_x = idwt2d(tokens_to_image(freq_x, h // 2, w // 2))
            freq_x = image_to_tokens(freq_x)
        elif self.use_dwt == "Fourier":
            freq_x = _ifft_tokens_real(freq_x)

        dp1 = DropPath(self.drop_path, name="drop_path")
        dp2 = DropPath(self.drop_path, name="drop_path2")
        return (
            shortcut
            + dp2(freq_x, deterministic=deterministic)
            + dp1(x, deterministic=deterministic)
        )


class DecoderBlock(nn.Module):
    """MDASSA + MLP + projection back to ``dim``
    (reference model.py:96-160)."""

    dim: int
    input_resolution: int
    num_heads: int = 4
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: int = 4
    token_mlp: str = "leff"
    drop_path: float = 0.0
    enc_out: bool = True
    freq_attn_win_ratio: int = 2
    use_dwt: str = "Fourier"
    dtype: object = jnp.float32
    mesh: object = None  # context-parallel mesh (MDASSA rolls/attn/FFTs)

    @nn.compact
    def __call__(self, x, enc_out=None, *, deterministic: bool = True):
        ws, ss = self.win_size, self.shift_size
        if self.input_resolution <= ws:
            ss = 0
            ws = self.input_resolution

        if enc_out is not None:
            x = jnp.concatenate([x, enc_out], axis=2)
        mdssa_dim = self.dim * 2 if self.enc_out else self.dim

        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = MDASSA(
            dim=mdssa_dim,
            win_size=ws,
            shift_size=ss,
            num_heads=self.num_heads,
            enc_out=self.enc_out,
            freq_attn_win_ratio=self.freq_attn_win_ratio,
            use_dwt=self.use_dwt,
            dtype=self.dtype,
            mesh=self.mesh,
            name="mdassa",
        )(x)
        y = x + shortcut
        x = x + shortcut
        b, l, c2 = x.shape
        h = w = int(math.sqrt(l))
        hid = int(mdssa_dim * self.mlp_ratio)
        if (self.token_mlp == "leff" and fused_leff_enabled()
                and cp_ops.context_size(self.mesh) <= 1
                and fused_leff.supports(h, w, c2, hid,
                                        jnp.dtype(self.dtype).itemsize)):
            # fused LN+LeFF Pallas kernel, residual form with the per-
            # sample DropPath scale applied in-kernel (same rng stream as
            # the unfused DropPath call).
            ln_s, ln_b = _LNParams(c2, name="norm2")()
            w1, b1, taps, bdw, w2, b2 = _LeFFParams(mdssa_dim, hid,
                                                    name="mlp")()
            s = DropPath(self.drop_path, name="drop_path")(
                jnp.ones((b, 1, 1), jnp.float32),
                deterministic=deterministic).reshape(b)
            xc = jnp.transpose(tokens_to_image(x, h, w), (0, 3, 1, 2))
            # the kernel's built-in residual adds x; the unfused path adds
            # y — but x and y are the identical `x + shortcut` expression
            # (reference model.py:150-157 quirk), so no correction needed.
            yc = fused_leff.fused_ln_leff(xc, ln_s, ln_b, w1, b1, taps,
                                          bdw, w2, b2, s)
            x = image_to_tokens(jnp.transpose(yc, (0, 2, 3, 1)))
        else:
            x = LayerNorm(dtype=self.dtype, name="norm2")(x)
            x = make_token_mlp(
                self.token_mlp, mdssa_dim, hid, self.dtype, "mlp"
            )(x)
            x = y + DropPath(self.drop_path, name="drop_path")(
                x, deterministic=deterministic
            )
        return Dense(self.dim, dtype=self.dtype, name="mlp_proj")(x)


class _NewFamilyBase(nn.Module):
    """Shared U-Net skeleton: 4 encoder levels (1 or 2 EncoderBlocks each),
    bottleneck DecoderBlock, 4 decoder levels (+ optional second DecoderBlock
    per level), global residual."""

    img_size: int = 256
    dd_in: int = 3
    embed_dim: int = 32
    drop_path_rate: float = 0.1
    use_dwt: str = "Fourier"
    token_mlp: str = "leff"
    blocks_per_level: int = 1
    dtype: object = jnp.float32
    remat: bool = False  # per-block rematerialization for HBM headroom
    remat_policy: object = None  # ops.layers.REMAT_POLICIES name
    # context-parallel mesh.  The decoders' MDASSA (rolls/window attention/
    # FDFP FFTs) is CP-routed; the encoders' Fourier quirk FFTs over the
    # (L, C) *token* axes (reference model.py:72) — not a spatial transform,
    # so it stays local and XLA inserts the gather when L is sharded.
    mesh: object = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        e = self.embed_dim
        s = self.img_size
        tm = self.token_mlp
        enc_dpr = np.linspace(0.0, self.drop_path_rate, 4)

        def apply1(block, y):
            return block(y, deterministic=deterministic)

        def apply2(block, y, skip):
            return block(y, enc_out=skip, deterministic=deterministic)

        rt = make_remat(self.remat, self.remat_policy)
        apply1 = rt(apply1)
        apply2 = rt(apply2)

        def enc(y, level, dim):
            y = apply1(EncoderBlock(
                dim=dim, token_mlp=tm, freq_mlp=tm, drop_path=float(enc_dpr[level]),
                use_dwt=self.use_dwt, dtype=self.dtype, name=f"encoder_{level}",
            ), y)
            if self.blocks_per_level > 1:
                # second block uses enc_dpr[0] (reference model.py:295,304,...)
                y = apply1(EncoderBlock(
                    dim=dim, token_mlp=tm, freq_mlp=tm, drop_path=float(enc_dpr[0]),
                    use_dwt=self.use_dwt, dtype=self.dtype, name=f"encoder_{level}_1",
                ), y)
            return y

        def dec(y, level, dim, reso, ratio, skip):
            y = apply2(DecoderBlock(
                dim=dim, input_resolution=reso, token_mlp=tm, enc_out=True,
                freq_attn_win_ratio=ratio, use_dwt=self.use_dwt, dtype=self.dtype,
                mesh=self.mesh, name=f"decoder_{level}",
            ), y, skip)
            if self.blocks_per_level > 1:
                y = apply1(DecoderBlock(
                    dim=dim, input_resolution=reso, token_mlp=tm, enc_out=False,
                    freq_attn_win_ratio=2, use_dwt=self.use_dwt, dtype=self.dtype,
                    mesh=self.mesh, name=f"decoder_{level}_1",
                ), y)
            return y

        y = InputProjection(out_channels=e, dtype=self.dtype, name="input_proj")(
            x.astype(self.dtype)
        )

        conv0 = enc(y, 0, e)
        pool0 = Downsample(e, dtype=self.dtype, name="downsample_0")(conv0)
        conv1 = enc(pool0, 1, e * 2)
        pool1 = Downsample(e * 2, dtype=self.dtype, name="downsample_1")(conv1)
        conv2 = enc(pool1, 2, e * 4)
        pool2 = Downsample(e * 4, dtype=self.dtype, name="downsample_2")(conv2)
        conv3 = enc(pool2, 3, e * 8)
        pool3 = Downsample(e * 8, dtype=self.dtype, name="downsample_3")(conv3)

        bott = DecoderBlock(
            dim=e * 16, input_resolution=s // 16, token_mlp=tm, enc_out=False,
            use_dwt=self.use_dwt, dtype=self.dtype, mesh=self.mesh,
            name="bottleneck",
        )(pool3, deterministic=deterministic)

        up3 = Upsample(e * 16, dtype=self.dtype, name="upsample_3")(bott)
        dec3 = dec(up3, 3, e * 8, s // 8, 2, conv3)
        up2 = Upsample(e * 8, dtype=self.dtype, name="upsample_2")(dec3)
        dec2 = dec(up2, 2, e * 4, s // 4, 4, conv2)
        up1 = Upsample(e * 4, dtype=self.dtype, name="upsample_1")(dec2)
        dec1 = dec(up1, 1, e * 2, s // 2, 8, conv1)
        up0 = Upsample(e * 2, dtype=self.dtype, name="upsample_0")(dec1)
        dec0 = dec(up0, 0, e, s, 16, conv0)

        out = OutputProjection(
            out_channels=self.dd_in, dtype=self.dtype, name="output_proj"
        )(tokens_to_image(dec0))
        return out + x.astype(out.dtype)


class NewModel(_NewFamilyBase):
    """MyModel (reference model.py:162-274): img_size 256, 1 block/level."""

    img_size: int = 256
    blocks_per_level: int = 1
    token_mlp: str = "leff"


class NewBigModel(_NewFamilyBase):
    """MyBigModel (reference model.py:277-463): img_size 512, 2 blocks/level,
    clean forward path (the reference's dead super-resolution tail and
    undefined adaptive_pool are dropped — they crash as written)."""

    img_size: int = 512
    blocks_per_level: int = 2
    token_mlp: str = "leff"


class NewBigFRFNModel(_NewFamilyBase):
    """MyBigFRFNModel (reference model.py:465-640): NewBigModel with FRFN
    token/freq MLPs everywhere."""

    img_size: int = 512
    blocks_per_level: int = 2
    token_mlp: str = "frfn"

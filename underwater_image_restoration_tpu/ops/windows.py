"""Window partition/reverse for NHWC feature maps.

TPU-native equivalent of the reference's window helpers (reference
``AST.py:377-402``, ``block.py:16-39``).  The dilation_rate=1 path is pure
reshape/transpose — XLA folds these into surrounding ops.

The dilated path (reference ``F.unfold`` with kernel=win, dilation=d,
padding=4*(d-1), stride=win) is dead in the reference — every call site
passes dilation_rate=1 — but is carried for API completeness as a static
gather (partition) / scatter-add (reverse).  Note the reference's OWN
dilated ``window_reverse`` crashes (AST.py:397 permutes 6 axes of a 4-D
tensor); ours implements the correct ``F.fold`` inverse it intended.

Shapes: (B, H, W, C) -> (B * H/w * W/w, w, w, C); windows are row-major over
the (H/w, W/w) grid exactly like the reference so masks/bias tables line up.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def window_partition(x, win_size: int, dilation_rate: int = 1):
    b, h, w, c = x.shape
    if dilation_rate != 1:
        d = int(dilation_rate)
        pad = 4 * (d - 1)
        span = (win_size - 1) * d + 1
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        n_h = (h + 2 * pad - span) // win_size + 1
        n_w = (w + 2 * pad - span) // win_size + 1
        # positions[k, i] = k*stride + i*dilation (the unfold sample grid)
        pos_h = (np.arange(n_h)[:, None] * win_size
                 + np.arange(win_size)[None, :] * d)     # (n_h, win)
        pos_w = (np.arange(n_w)[:, None] * win_size
                 + np.arange(win_size)[None, :] * d)
        wins = xp[:, pos_h.reshape(-1)][:, :, pos_w.reshape(-1)]
        wins = wins.reshape(b, n_h, win_size, n_w, win_size, c)
        wins = jnp.transpose(wins, (0, 1, 3, 2, 4, 5))
        return wins.reshape(-1, win_size, win_size, c)
    x = x.reshape(b, h // win_size, win_size, w // win_size, win_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, win_size, win_size, c)


def window_reverse(windows, win_size: int, h: int, w: int,
                   dilation_rate: int = 1):
    c = windows.shape[-1]
    if dilation_rate != 1:
        d = int(dilation_rate)
        pad = 4 * (d - 1)
        span = (win_size - 1) * d + 1
        n_h = (h + 2 * pad - span) // win_size + 1
        n_w = (w + 2 * pad - span) // win_size + 1
        b = windows.shape[0] // (n_h * n_w)
        wins = windows.reshape(b, n_h, n_w, win_size, win_size, c)
        wins = jnp.transpose(wins, (0, 1, 3, 2, 4, 5))  # b, n_h, win, n_w, win, c
        wins = wins.reshape(b, n_h * win_size, n_w * win_size, c)
        pos_h = (np.arange(n_h)[:, None] * win_size
                 + np.arange(win_size)[None, :] * d).reshape(-1)
        pos_w = (np.arange(n_w)[:, None] * win_size
                 + np.arange(win_size)[None, :] * d).reshape(-1)
        out = jnp.zeros((b, h + 2 * pad, w + 2 * pad, c), windows.dtype)
        # F.fold: overlapping patch samples SUM into the output
        out = out.at[:, pos_h[:, None], pos_w[None, :], :].add(wins)
        return out[:, pad:pad + h, pad:pad + w, :]
    b = windows.shape[0] // ((h // win_size) * (w // win_size))
    x = windows.reshape(b, h // win_size, w // win_size, win_size, win_size, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, c)


def shift_window_mask(h: int, w: int, win_size: int, shift_size: int) -> np.ndarray:
    """Precomputed SW-MSA attention mask (reference AST.py:568-588).

    Returns (nW, win*win, win*win) float32 with 0 for same-region pairs and
    -100 across regions.  Built with numpy at trace time — static shapes.
    """
    img = np.zeros((h, w), dtype=np.int32)
    slices = (
        slice(0, -win_size),
        slice(-win_size, -shift_size),
        slice(-shift_size, None),
    )
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(h // win_size, win_size, w // win_size, win_size)
    img = img.transpose(0, 2, 1, 3).reshape(-1, win_size * win_size)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """Pairwise relative-position index table (reference AST.py:84-93)."""
    coords = np.stack(
        np.meshgrid(np.arange(win_h), np.arange(win_w), indexing="ij")
    )  # 2, Wh, Ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int32)
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1)  # (N, N)

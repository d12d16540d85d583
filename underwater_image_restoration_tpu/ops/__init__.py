from .layers import (
    Conv2d,
    ConvTranspose2d,
    Dense,
    LayerNorm,
    gelu,
    l2_normalize,
    leaky_relu,
    make_remat,
)
from .droppath import DropPath
from .resample import (
    image_to_tokens,
    pixel_shuffle,
    pixel_unshuffle,
    resize_bicubic,
    resize_bilinear,
    tokens_to_image,
)
from .windows import (
    relative_position_index,
    shift_window_mask,
    window_partition,
    window_reverse,
)
from .wavelets import dwt2d, idwt2d
from .attention import (
    channel_attention_core,
    channel_attention_core_nhwc,
    merge_heads,
    split_heads,
    sparse_mix_weights,
    window_attention,
    window_attention_core,
)
from . import spectral

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "Dense",
    "LayerNorm",
    "gelu",
    "l2_normalize",
    "leaky_relu",
    "make_remat",
    "DropPath",
    "image_to_tokens",
    "pixel_shuffle",
    "pixel_unshuffle",
    "resize_bicubic",
    "resize_bilinear",
    "tokens_to_image",
    "relative_position_index",
    "shift_window_mask",
    "window_partition",
    "window_reverse",
    "dwt2d",
    "idwt2d",
    "channel_attention_core",
    "channel_attention_core_nhwc",
    "merge_heads",
    "split_heads",
    "sparse_mix_weights",
    "window_attention",
    "window_attention_core",
    "spectral",
]

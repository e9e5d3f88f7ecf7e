from dreamvla_tpu.ops.posemb import (
    get_1d_sincos_pos_embed,
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
)
from dreamvla_tpu.ops.patchify import (
    normalize_patchified,
    patchify,
    pixel_unshuffle_tracks,
    unpatchify,
)
from dreamvla_tpu.ops.masks import MaskSpec, build_attention_bias
from dreamvla_tpu.ops.attention import multi_head_attention
from dreamvla_tpu.ops.augment import random_shifts_aug

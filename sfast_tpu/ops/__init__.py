from sfast_tpu.ops.attention import dot_product_attention
from sfast_tpu.ops.group_norm import group_norm, group_norm_silu
from sfast_tpu.ops.layer_norm import layer_norm
from sfast_tpu.ops.geglu import linear_geglu
from sfast_tpu.ops.linear import linear
from sfast_tpu.ops.conv import conv2d

__all__ = [
    "dot_product_attention",
    "group_norm",
    "group_norm_silu",
    "layer_norm",
    "linear_geglu",
    "linear",
    "conv2d",
]

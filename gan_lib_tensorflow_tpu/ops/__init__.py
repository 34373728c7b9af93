"""Shared ops library — the TPU-native equivalent of the reference's
``common/`` (tflib-lineage) layer zoo."""

from . import initializers
from .blocks import DiscOptimizedBlock, DiscResBlock, GenResBlock
from .layers import (
    Conv,
    ConvTranspose,
    Dense,
    DownsampleConv,
    Embedding,
    UpsampleConv,
    downsample_avg,
    global_sum_pool,
    upsample_nearest,
)
from .norms import (
    BatchNorm,
    ConditionalBatchNorm,
    LayerNorm,
    minibatch_stddev,
    pixel_norm,
)
from .sn import power_iteration, spectral_normalize

__all__ = [
    "initializers",
    "Conv", "ConvTranspose", "Dense", "Embedding",
    "UpsampleConv", "DownsampleConv",
    "upsample_nearest", "downsample_avg", "global_sum_pool",
    "BatchNorm", "ConditionalBatchNorm", "LayerNorm", "pixel_norm",
    "minibatch_stddev",
    "spectral_normalize", "power_iteration",
    "GenResBlock", "DiscResBlock", "DiscOptimizedBlock",
]

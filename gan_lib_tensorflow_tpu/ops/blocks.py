"""Residual blocks for the SNGAN ResNet family (CIFAR and ImageNet-128).

Reference: ``SNGAN/model_resnet.py`` (CIFAR) and the ImageNet sibling in
watsonyanghx/GAN_Lib_Tensorflow (pfnet-research/sngan_projection lineage):

* Generator block:  BN -> ReLU -> (2x nearest upsample) -> 3x3 conv -> BN ->
  ReLU -> 3x3 conv, skip = (upsample ->) 1x1 conv when shape changes. With
  ``num_classes > 0`` the BNs become conditional BN (projection-SNGAN G).
* Discriminator block: ReLU -> 3x3 SNconv -> ReLU -> 3x3 SNconv ->
  (avg-pool 2x); skip = 1x1 SNconv (+ avg-pool). All D weights spectral-normed.
* "Optimized" first D block (the input block): 3x3 SNconv -> ReLU -> 3x3
  SNconv -> avg-pool, skip = avg-pool -> 1x1 SNconv — avoids a ReLU on raw
  pixels and pools *after* the 1x1 on the skip path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import (Conv, DownsampleConv, UpsampleConv, downsample_avg,
                     upsample_nearest)
from .norms import BatchNorm, ConditionalBatchNorm

Dtype = Any


class GenResBlock(nn.Module):
    """SNGAN generator residual block with optional 2x upsample and optional
    class-conditional BN."""

    features: int
    upsample: bool = False
    num_classes: int = 0  # 0 => unconditional BN
    compute_dtype: Optional[Dtype] = None

    def _bn(self, name):
        if self.num_classes > 0:
            return ConditionalBatchNorm(
                self.num_classes,
                compute_dtype=self.compute_dtype, name=name)
        return BatchNorm(compute_dtype=self.compute_dtype, name=name)

    @nn.compact
    def __call__(self, x, labels=None, *, train: bool = True):
        def bn(h, name):
            if self.num_classes > 0:
                return self._bn(name)(h, labels, use_running_average=not train)
            return self._bn(name)(h, use_running_average=not train)

        in_c = x.shape[-1]
        needs_proj = self.upsample or (in_c != self.features)

        h = bn(x, "bn1")
        h = nn.relu(h)
        if self.upsample:
            # fused upsample+conv: no materialized 4x activation, ~2.25x MACs
            h = UpsampleConv(self.features, 3, compute_dtype=self.compute_dtype,
                             name="conv1")(h)
        else:
            h = Conv(self.features, 3, compute_dtype=self.compute_dtype,
                     name="conv1")(h)
        h = bn(h, "bn2")
        h = nn.relu(h)
        h = Conv(self.features, 3, compute_dtype=self.compute_dtype, name="conv2")(h)

        if self.upsample:
            s = UpsampleConv(self.features, 1, compute_dtype=self.compute_dtype,
                             name="conv_skip")(x)
        elif needs_proj:
            s = Conv(self.features, 1, compute_dtype=self.compute_dtype,
                     name="conv_skip")(x)
        else:
            s = x
        return h + s


class DiscResBlock(nn.Module):
    """SNGAN discriminator residual block: all convs spectral-normalized,
    optional 2x average-pool downsample.

    ``fused=True`` (default) computes the downsampling paths algebraically
    fused, bit-equal up to float reassociation (see ops.fused):

    * conv2-then-pool becomes one stride-2 conv with the smeared SN'd kernel
      (~2.25x fewer MACs and no full-res conv2 activation in HBM);
    * the skip's 1x1-conv-then-pool becomes pool-then-1x1-conv (a 1x1 conv is
      a per-pixel linear map, so it commutes with box averaging — 4x fewer
      MACs, exact).

    Params and sn-state names are identical in both modes, so checkpoints are
    interchangeable."""

    features: int
    downsample: bool = False
    first_relu: bool = True
    fused: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, update_sn: bool = False):
        in_c = x.shape[-1]
        needs_proj = self.downsample or (in_c != self.features)
        fused = self.fused and self.downsample

        h = nn.relu(x) if self.first_relu else x
        h = Conv(self.features, 3, spectral_norm=True, compute_dtype=self.compute_dtype,
                 name="conv1")(h, update_sn=update_sn)
        h = nn.relu(h)
        if fused:
            h = DownsampleConv(self.features, 3, spectral_norm=True,
                               compute_dtype=self.compute_dtype,
                               name="conv2")(h, update_sn=update_sn)
        else:
            h = Conv(self.features, 3, spectral_norm=True, compute_dtype=self.compute_dtype,
                     name="conv2")(h, update_sn=update_sn)
            if self.downsample:
                h = downsample_avg(h)

        s = x
        if fused:  # fused => downsample => needs_proj
            s = Conv(self.features, 1, spectral_norm=True, compute_dtype=self.compute_dtype,
                     name="conv_skip")(downsample_avg(s), update_sn=update_sn)
        else:
            if needs_proj:
                s = Conv(self.features, 1, spectral_norm=True, compute_dtype=self.compute_dtype,
                         name="conv_skip")(s, update_sn=update_sn)
            if self.downsample:
                s = downsample_avg(s)
        return h + s


class DiscOptimizedBlock(nn.Module):
    """The special first (input) D block: conv before any ReLU; skip path pools
    before its 1x1 conv (matching the reference's OptimizedBlock).

    ``fused=True`` fuses conv2-then-pool into one stride-2 conv (exact; see
    DiscResBlock). The skip already pools first in the reference layout."""

    features: int
    fused: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, update_sn: bool = False):
        h = Conv(self.features, 3, spectral_norm=True, compute_dtype=self.compute_dtype,
                 name="conv1")(x, update_sn=update_sn)
        h = nn.relu(h)
        if self.fused:
            h = DownsampleConv(self.features, 3, spectral_norm=True,
                               compute_dtype=self.compute_dtype,
                               name="conv2")(h, update_sn=update_sn)
        else:
            h = Conv(self.features, 3, spectral_norm=True, compute_dtype=self.compute_dtype,
                     name="conv2")(h, update_sn=update_sn)
            h = downsample_avg(h)

        s = downsample_avg(x)
        s = Conv(self.features, 1, spectral_norm=True, compute_dtype=self.compute_dtype,
                 name="conv_skip")(s, update_sn=update_sn)
        return h + s

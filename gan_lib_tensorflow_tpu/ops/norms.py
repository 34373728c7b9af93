"""Normalization layers: BatchNorm, ConditionalBatchNorm, LayerNorm, PixelNorm,
plus the PGGAN minibatch-stddev feature.

Reference surface in watsonyanghx/GAN_Lib_Tensorflow:
* ``common/ops/batchnorm.py``       — fused BN with moving-average inference stats
* ``common/ops/cond_batchnorm.py``  — per-class gamma/beta looked up by label
  (used by ACGAN G and the SNGAN-projection G, conditional on 1000 classes)
* ``common/ops/layernorm.py``       — LN for WGAN-GP discriminators (BN breaks
  the gradient penalty)
* PGGAN lineage                     — PixelNorm after every G conv and a
  minibatch-stddev channel in the last D block

TPU-native notes:
* Running stats live in the ``'batch_stats'`` collection — explicit pytree
  state instead of TF1 moving-average update ops.
* BN-under-DP semantics: the framework runs every step under jit+GSPMD
  with the batch dim sharded over 'data', so the per-step batch mean/var
  computed here ARE the global-batch statistics (XLA inserts the cross-chip
  reduction for the full-batch jnp.mean). No separate sync-BN code path
  exists — an ``axis_name``/``lax.pmean`` variant would only be legal inside
  shard_map/pmap, which this framework never uses (see docs/DESIGN.md).
* All stat math in float32 regardless of compute dtype (bf16-safe).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import initializers
from .layers import Embedding

Dtype = Any


class BatchNorm(nn.Module):
    """Batch normalization over N,H,W with moving-average inference stats.

    Reference: ``common/ops/batchnorm.py`` ``Batchnorm(name, axes=[0,1,2], x,
    is_training, stats_iter)``.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: Optional[bool] = None) -> jnp.ndarray:
        ura = nn.merge_param("use_running_average", self.use_running_average, use_running_average)
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features, jnp.float32))

        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", initializers.ones, (features,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", initializers.zeros, (features,), jnp.float32)
            y = y + bias
        return y.astype(x.dtype if self.compute_dtype is None else self.compute_dtype)


class ConditionalBatchNorm(nn.Module):
    """BN whose gamma/beta are per-class embeddings selected by label.

    Reference: ``common/ops/cond_batchnorm.py`` — an embedding of shape
    ``[n_labels, C]`` for each of gamma and beta, indexed by the integer class
    label. gamma initialized to 1, beta to 0.
    """

    num_classes: int
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        labels: jnp.ndarray,
        use_running_average: Optional[bool] = None,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        normed = BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=False,
            use_bias=False,
            compute_dtype=jnp.float32,
            name="bn",
        )(x, use_running_average)
        gamma = Embedding(
            self.num_classes, features, embedding_init=initializers.ones, name="gamma"
        )(labels)
        beta = Embedding(
            self.num_classes, features, embedding_init=initializers.zeros, name="beta"
        )(labels)
        # broadcast [N, C] -> [N, 1, 1, C] for NHWC feature maps
        while gamma.ndim < x.ndim:
            gamma = gamma[:, None]
            beta = beta[:, None]
        y = normed * gamma + beta
        return y.astype(x.dtype if self.compute_dtype is None else self.compute_dtype)


class LayerNorm(nn.Module):
    """Layer normalization over all non-batch axes.

    Reference: ``common/ops/layernorm.py`` — used in WGAN-GP discriminators
    where BN would couple samples and corrupt the per-sample gradient penalty.
    """

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        reduce_axes = tuple(range(1, x.ndim))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", initializers.ones, (features,), jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", initializers.zeros, (features,), jnp.float32)
        return y.astype(x.dtype if self.compute_dtype is None else self.compute_dtype)


def pixel_norm(x: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """PGGAN PixelNorm: normalize each pixel's feature vector to unit RMS
    (Karras et al. 2018 §4.2; applied after every G conv in the reference
    PGGAN lineage). Pure function — no learned params."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + epsilon)
    return y.astype(x.dtype)


def minibatch_stddev(x: jnp.ndarray, group_size: int = 4, epsilon: float = 1e-8) -> jnp.ndarray:
    """PGGAN minibatch standard deviation: append one channel holding the
    group-wise mean feature stddev (Karras et al. 2018 §3).

    Matches the reference semantics: split batch into groups of
    ``min(group_size, N)``, per-group stddev over the batch axis, averaged over
    H/W/C, broadcast back as a constant extra channel.
    """
    n, h, w, c = x.shape
    g = min(group_size, n)
    # Require divisibility (reference asserts the same); static shapes for XLA.
    assert n % g == 0, f"batch {n} not divisible by group size {g}"
    xf = x.astype(jnp.float32).reshape(g, n // g, h, w, c)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=0)
    stddev = jnp.sqrt(var + epsilon)
    avg = jnp.mean(stddev, axis=(1, 2, 3), keepdims=True)  # [n//g, 1, 1, 1]
    feat = jnp.broadcast_to(avg[None], (g, n // g, h, w, 1)).reshape(n, h, w, 1)
    return jnp.concatenate([x, feat.astype(x.dtype)], axis=-1)

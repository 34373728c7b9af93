"""Core parameterized layers: Dense / Conv / ConvTranspose / Embedding.

Reference surface (tflib lineage, ``common/ops/{linear,conv2d,deconv2d}.py`` in
watsonyanghx/GAN_Lib_Tensorflow): free functions ``Linear(name, in, out, x)``,
``Conv2D(name, in_c, out_c, k, x, he_init, stride)``, ``Deconv2D(...)`` backed
by a global string-keyed param registry, with optional spectral norm hooks.

TPU-native redesign decisions:

* **NHWC layout** everywhere — the native TPU conv layout (the reference
  lineage mixes NCHW (igul222) and NHWC (pix2pix/PGGAN); on TPU there is one
  right answer).
* Params are flax module params (an explicit pytree), not a global registry;
  per-network param groups (G vs D optimizer lists, the reference's
  ``params_with_name`` use case) fall out of module nesting for free.
* ``compute_dtype`` (bfloat16 by default on TPU benches) casts activations and
  kernels at the MXU boundary while params/optimizer state stay float32.
* Spectral norm (``spectral_norm=True``) and equalized LR (``equalized=True``,
  PGGAN) are first-class flags on every layer rather than call-site wrappers.
* TF ``SAME`` padding semantics come from XLA's ``'SAME'`` — identical
  asymmetric padding rules, so stride-2 down/up paths match the reference
  shapes exactly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import initializers
from .sn import spectral_normalize

Dtype = Any
Initializer = Callable[..., jnp.ndarray]


def _maybe_cast(x: jnp.ndarray, dtype: Optional[Dtype]) -> jnp.ndarray:
    return x if dtype is None else x.astype(dtype)


class Dense(nn.Module):
    """Linear layer (reference: ``common/ops/linear.py`` ``Linear``).

    ``kernel_init`` also accepts the reference's initialization strings
    ('he', 'glorot', ...); ``weight_norm=True`` reparameterizes each output
    column as ``w * g / ||w||`` with ``g`` initialized to the column norms at
    init (tflib ``weightnorm=True``) — identity at step 0, learned scale
    thereafter."""

    features: int
    use_bias: bool = True
    kernel_init: Union[str, Initializer] = initializers.he_normal
    bias_init: Initializer = initializers.zeros
    spectral_norm: bool = False
    sn_iters: int = 1
    weight_norm: bool = False
    equalized: bool = False
    lr_mul: float = 1.0
    gain: float = float(np.sqrt(2.0))
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kinit = (initializers.unit_normal if self.equalized
                 else initializers.get(self.kernel_init))
        kernel = self.param("kernel", kinit, (in_dim, self.features), jnp.float32)
        if self.equalized:
            kernel = kernel * (initializers.he_scale(kernel.shape, self.gain) * self.lr_mul)
        if self.weight_norm:
            norms = jnp.sqrt(jnp.sum(jnp.square(kernel), axis=0) + 1e-12)
            g = self.param("wn_g", lambda rng: norms)
            kernel = kernel * (g / norms)
        if self.spectral_norm:
            kernel = spectral_normalize(self, kernel, update_sn, self.sn_iters)
        y = _maybe_cast(x, self.compute_dtype) @ _maybe_cast(kernel, self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.equalized:
                bias = bias * self.lr_mul
            y = y + _maybe_cast(bias, self.compute_dtype)
        return y


class Conv(nn.Module):
    """2-D convolution, NHWC / HWIO, TF-SAME padding.

    Reference: ``common/ops/conv2d.py`` ``Conv2D(name, in_c, out_c, k, x,
    he_init, stride)``.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    kernel_init: Union[str, Initializer] = initializers.he_normal
    bias_init: Initializer = initializers.zeros
    spectral_norm: bool = False
    sn_iters: int = 1
    equalized: bool = False
    lr_mul: float = 1.0
    gain: float = float(np.sqrt(2.0))
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        ksize = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        strides = (self.strides,) * 2 if isinstance(self.strides, int) else tuple(self.strides)
        in_c = x.shape[-1]
        kshape = (*ksize, in_c, self.features)  # HWIO
        kinit = (initializers.unit_normal if self.equalized
                 else initializers.get(self.kernel_init))
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        if self.equalized:
            kernel = kernel * (initializers.he_scale(kshape, self.gain) * self.lr_mul)
        if self.spectral_norm:
            kernel = spectral_normalize(self, kernel, update_sn, self.sn_iters)
        y = jax.lax.conv_general_dilated(
            _maybe_cast(x, self.compute_dtype),
            _maybe_cast(kernel, self.compute_dtype),
            window_strides=strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.equalized:
                bias = bias * self.lr_mul
            y = y + _maybe_cast(bias, self.compute_dtype)
        return y


class ConvTranspose(nn.Module):
    """2-D transposed convolution (fractionally-strided), NHWC, TF-SAME.

    Reference: ``common/ops/deconv2d.py`` ``Deconv2D`` via
    ``tf.nn.conv2d_transpose`` — fixed 2x upsampling with SAME padding. With
    ``padding='SAME'`` and stride s, output spatial dims are exactly ``s * in``,
    matching TF.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 5
    strides: Union[int, Tuple[int, int]] = 2
    use_bias: bool = True
    kernel_init: Union[str, Initializer] = initializers.he_normal
    bias_init: Initializer = initializers.zeros
    spectral_norm: bool = False
    sn_iters: int = 1
    equalized: bool = False
    lr_mul: float = 1.0
    gain: float = float(np.sqrt(2.0))
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        ksize = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        strides = (self.strides,) * 2 if isinstance(self.strides, int) else tuple(self.strides)
        in_c = x.shape[-1]
        kshape = (*ksize, in_c, self.features)  # HWIO for lax.conv_transpose
        kinit = (initializers.unit_normal if self.equalized
                 else initializers.get(self.kernel_init))
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        if self.equalized:
            kernel = kernel * (initializers.he_scale(kshape, self.gain) * self.lr_mul)
        if self.spectral_norm:
            kernel = spectral_normalize(self, kernel, update_sn, self.sn_iters)
        y = jax.lax.conv_transpose(
            _maybe_cast(x, self.compute_dtype),
            _maybe_cast(kernel, self.compute_dtype),
            strides=strides,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.equalized:
                bias = bias * self.lr_mul
            y = y + _maybe_cast(bias, self.compute_dtype)
        return y


class UpsampleConv(nn.Module):
    """nearest-2x-upsample followed by conv, computed fused (see ops.fused).

    Param-compatible with ``Conv`` ('kernel'/'bias' of the un-fused kxk conv),
    so checkpoints are interchangeable with the composed form. Set
    ``fused=False`` to fall back to explicit upsample-then-conv.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    kernel_init: Union[str, Initializer] = initializers.he_normal
    bias_init: Initializer = initializers.zeros
    equalized: bool = False
    lr_mul: float = 1.0
    gain: float = float(np.sqrt(2.0))
    fused: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from .fused import upsample2x_conv

        ksize = (self.kernel_size,) * 2
        in_c = x.shape[-1]
        kshape = (*ksize, in_c, self.features)
        kinit = (initializers.unit_normal if self.equalized
                 else initializers.get(self.kernel_init))
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        if self.equalized:
            kernel = kernel * (initializers.he_scale(kshape, self.gain) * self.lr_mul)
        if self.fused:
            y = upsample2x_conv(x, kernel, compute_dtype=self.compute_dtype)
        else:
            y = jax.lax.conv_general_dilated(
                _maybe_cast(upsample_nearest(x), self.compute_dtype),
                _maybe_cast(kernel, self.compute_dtype),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.equalized:
                bias = bias * self.lr_mul
            y = y + _maybe_cast(bias, self.compute_dtype)
        return y


class DownsampleConv(nn.Module):
    """conv followed by box-downsample-2x, computed fused (see ops.fused) —
    the D-side dual of ``UpsampleConv`` (PGGAN high-res discriminator blocks).

    Param-compatible with ``Conv`` ('kernel'/'bias' of the un-fused kxk conv),
    so checkpoints and ``migrate_params`` are interchangeable with the
    composed form. Set ``fused=False`` for explicit conv-then-downsample.
    The bias adds AFTER the downsample (a per-channel constant commutes with
    box averaging, so this is exact and cheaper at quarter resolution).

    ``spectral_norm=True`` (SNGAN discriminator down-blocks) normalizes the
    RAW kxk kernel by its sigma first and smears the normalized kernel —
    identical to SN-conv-then-pool, since pooling commutes with the kernel
    transform: pool(conv(x, W/sigma)) == stride2conv(x, smear(W)/sigma).
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    kernel_init: Union[str, Initializer] = initializers.he_normal
    bias_init: Initializer = initializers.zeros
    spectral_norm: bool = False
    sn_iters: int = 1
    equalized: bool = False
    lr_mul: float = 1.0
    gain: float = float(np.sqrt(2.0))
    fused: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        from .fused import conv_downscale2x

        ksize = (self.kernel_size,) * 2
        in_c = x.shape[-1]
        kshape = (*ksize, in_c, self.features)
        kinit = (initializers.unit_normal if self.equalized
                 else initializers.get(self.kernel_init))
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        if self.equalized:
            kernel = kernel * (initializers.he_scale(kshape, self.gain) * self.lr_mul)
        if self.spectral_norm:
            kernel = spectral_normalize(self, kernel, update_sn, self.sn_iters)
        if self.fused:
            y = conv_downscale2x(x, kernel, compute_dtype=self.compute_dtype)
        else:
            y = downsample_avg(jax.lax.conv_general_dilated(
                _maybe_cast(x, self.compute_dtype),
                _maybe_cast(kernel, self.compute_dtype),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.equalized:
                bias = bias * self.lr_mul
            y = y + _maybe_cast(bias, self.compute_dtype)
        return y


class Embedding(nn.Module):
    """Label embedding (reference: ``common/ops/embedding.py``), optionally
    spectral-normalized — the projection discriminator SN-normalizes its class
    embedding matrix (SNGAN-projection lineage)."""

    num_embeddings: int
    features: int
    embedding_init: Initializer = initializers.glorot_uniform
    spectral_norm: bool = False
    sn_iters: int = 1
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, labels: jnp.ndarray, *, update_sn: bool = False) -> jnp.ndarray:
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features), jnp.float32
        )
        if self.spectral_norm:
            table = spectral_normalize(self, table, update_sn, self.sn_iters)
        return _maybe_cast(table, self.compute_dtype)[labels]


# ---------------------------------------------------------------------------
# Resize helpers (pure functions — used by resblocks and PGGAN fade-in)
# ---------------------------------------------------------------------------

def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC. The SNGAN G resblock path
    (resize-then-conv) and PGGAN's fade-in both use nearest/box scaling.

    Implemented with reshape+broadcast (no gather) so XLA lowers it to a cheap
    relayout that fuses with the following conv.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def downsample_avg(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Box-filter (mean-pool) downsample, NHWC — the reference D resblocks'
    ``tf.nn.avg_pool`` / PGGAN downscale2d."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def global_sum_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Global **sum** pooling over H, W — the SNGAN/projection discriminators
    sum-pool (not mean-pool) before the final linear layer."""
    return jnp.sum(x, axis=(1, 2))

"""PGGAN: progressive-growing G/D with equalized LR, PixelNorm,
minibatch-stddev, fade-in blending, and WGAN-GP loss.

Reference: ``PGGAN/model.py`` + ``PGGAN/train.py`` (tkarras
progressive_growing_of_gans TF1 lineage, SURVEY.md §2.2/§3.3):

* per-resolution networks sharing a trunk; toRGB/fromRGB 1x1 convs per level
* equalized learning rate (unit-normal init, He multiplier at runtime)
* PixelNorm after every G conv; LeakyReLU(0.2) in both nets; no norm in D
* minibatch-stddev feature in the last D block
* fade-in: out = alpha * new_path + (1 - alpha) * upsample(old_path)
* loss: WGAN-GP (lambda=10) + 1e-3 drift; Adam(1e-3, 0, 0.99); G EMA 0.999

TPU-native redesign: the reference rebuilds the TF1 graph per level and
restores trunk weights through ``Saver``. Here each (resolution, phase) is a
flax module configured statically — fade-in ``alpha`` is a *traced* scalar
carried in the train state (no recompile per alpha tick) — and cross-level
growth is pytree surgery (``migrate_params``): modules are named by
resolution (``block_8``, ``torgb_32``...) so shared trunk params line up
across stages by path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.traverse_util import flatten_dict, unflatten_dict

from ..losses import drift_penalty, gradient_penalty, wgan_d_loss, wgan_g_loss
from ..ops import Conv, Dense, downsample_avg, minibatch_stddev, pixel_norm, upsample_nearest
from ..ops import s2d
from ..ops.layers import DownsampleConv, UpsampleConv
from ..train.step import GANSpec

Dtype = Any

# Karras channel schedule (fmap_base 8192, cap 512), scaled by width_mul for
# tiny test configs.
_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256,
             128: 128, 256: 64, 512: 32, 1024: 16}


def nf(res: int, width_mul: float = 1.0) -> int:
    return max(int(_CHANNELS[res] * width_mul), 4)


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


class _GenBlock(nn.Module):
    """One G level: fused up2+conv3x3 -> PN -> conv3x3 -> PN. Remat boundary:
    wrapping THIS module stores only the level-boundary activation (the
    dominant 1024^2-scale tensors inside recompute in backward)."""

    features: int
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h):
        h = UpsampleConv(self.features, 3, equalized=True,
                         compute_dtype=self.compute_dtype, name="conv1")(h)
        h = pixel_norm(_lrelu(h))
        h = Conv(self.features, 3, equalized=True,
                 compute_dtype=self.compute_dtype, name="conv2")(h)
        return pixel_norm(_lrelu(h))


class _DiscBlock(nn.Module):
    """One D level: conv3x3 -> conv3x3 (channel step) -> avg-pool.

    ``fused_scale=True`` computes the second conv and the downsample as ONE
    stride-2 conv (ops.fused.conv_downscale2x — exact dual of the G-side
    fused upsample) and applies the LeakyReLU after the downsample. That
    nonlinearity reorder is the reference lineage's own ``fused_scale``
    semantics (tkarras PGGAN uses it at high resolutions as a perf variant);
    params stay bit-compatible with the composed form, so migrate_params and
    checkpoints are unaffected by the toggle."""

    features1: int
    features2: int
    fused_scale: bool = False
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h):
        h = Conv(self.features1, 3, equalized=True,
                 compute_dtype=self.compute_dtype, name="conv1")(h)
        h = _lrelu(h)
        if self.fused_scale:
            h = DownsampleConv(self.features2, 3, equalized=True,
                               compute_dtype=self.compute_dtype, name="conv2")(h)
            return _lrelu(h)
        h = Conv(self.features2, 3, equalized=True,
                 compute_dtype=self.compute_dtype, name="conv2")(h)
        h = _lrelu(h)
        return downsample_avg(h)


class _ConvParams(nn.Module):
    """Bare equalized-LR conv params ('kernel'/'bias'), identical in name,
    shape, init, and runtime scaling to what ``Conv``/``UpsampleConv``/
    ``DownsampleConv`` declare — the S2D blocks transform the LOGICAL kernel
    (ops/s2d.py), so checkpoints and migrate_params are interchangeable with
    the composed path."""

    features: int
    ksize: int = 3
    gain: float = float(np.sqrt(2.0))

    @nn.compact
    def __call__(self, in_c: int):
        from ..ops import initializers
        kshape = (self.ksize, self.ksize, in_c, self.features)
        kernel = self.param("kernel", initializers.unit_normal, kshape,
                            jnp.float32)
        kernel = kernel * initializers.he_scale(kshape, self.gain)
        bias = self.param("bias", initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


def _bias_add(y, bias, dt):
    return y + (bias if dt is None else bias.astype(dt))


class _GenBlockS2D(nn.Module):
    """_GenBlock computed on the factor-2 space-to-depth grid (ops/s2d.py):
    input normal (B,H,W,Cin), output S2D (B,H,W,4f) representing (2H,2W,f).
    Exact same function and params as _GenBlock — a compute-layout variant
    for the low-channel top levels (s2d_from)."""

    features: int
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h):
        dt = self.compute_dtype
        k1, b1 = _ConvParams(self.features, name="conv1")(h.shape[-1])
        h = s2d.conv_same(h, s2d.s2d_upconv_kernel(k1), dt)
        h = _bias_add(h, s2d.tile_bias(b1), dt)
        h = s2d.pixel_norm_s2d(_lrelu(h))
        k2, b2 = _ConvParams(self.features, name="conv2")(self.features)
        h = s2d.conv_same(h, s2d.s2d_conv_kernel(k2), dt)
        h = _bias_add(h, s2d.tile_bias(b2), dt)
        return s2d.pixel_norm_s2d(_lrelu(h))


class _DiscBlockS2D(nn.Module):
    """_DiscBlock(fused_scale=True) computed on the space-to-depth grid:
    input S2D (B,H/2,W/2,4Cin) representing (H,W,Cin), output NORMAL
    (B,H/2,W/2,f2). Same nonlinearity ordering as fused_scale (lrelu after
    the downscale); params identical to the composed block."""

    features1: int
    features2: int
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, h):
        dt = self.compute_dtype
        in_c = h.shape[-1] // 4
        k1, b1 = _ConvParams(self.features1, name="conv1")(in_c)
        h = s2d.conv_same(h, s2d.s2d_conv_kernel(k1), dt)
        h = _bias_add(h, s2d.tile_bias(b1), dt)
        h = _lrelu(h)
        k2, b2 = _ConvParams(self.features2, name="conv2")(self.features1)
        h = s2d.conv_same(h, s2d.s2d_downconv_kernel(k2), dt)
        h = _bias_add(h, b2, dt)
        return _lrelu(h)


class PGGANGenerator(nn.Module):
    resolution: int = 1024          # output resolution of THIS stage
    fade_in: bool = False           # transition phase: blend prev-level RGB
    z_dim: int = 512
    width_mul: float = 1.0          # shrink for tests
    # rematerialize whole per-level blocks at resolutions >= this (0 = never):
    # only level-boundary activations are stored, trading recompute FLOPs for
    # the 512/1024-level memory. Toggling does not change param structure.
    remat_from: int = 0
    # compute levels >= this on the space-to-depth grid (ops/s2d.py) — the
    # low-channel high-res perf knob; exact, param-compatible. 0 = off.
    s2d_from: int = 0
    compute_dtype: Optional[Dtype] = None

    def _torgb(self, h, h_s2d, res, dt):
        if not h_s2d:
            return Conv(3, 1, equalized=True, gain=1.0, compute_dtype=dt,
                        name=f"torgb_{res}")(h)
        k, b = _ConvParams(3, ksize=1, gain=1.0, name=f"torgb_{res}")(
            h.shape[-1] // 4)
        rgb = s2d.conv_same(h, s2d.s2d_conv_kernel(k), dt)
        return s2d.depth_to_space(_bias_add(rgb, s2d.tile_bias(b), dt))

    @nn.compact
    def __call__(self, z, alpha=1.0, *, train: bool = True):
        del train  # no BN anywhere — pixelnorm is stateless
        wm = self.width_mul
        dt = self.compute_dtype

        h = pixel_norm(z[:, None, None, :])  # normalize latents (Karras §4.2)
        h = Dense(4 * 4 * nf(4, wm), equalized=True,
                  compute_dtype=dt, name="dense_4")(h.reshape(z.shape[0], -1))
        h = h.reshape(-1, 4, 4, nf(4, wm))
        h = pixel_norm(_lrelu(h))
        h = Conv(nf(4, wm), 3, equalized=True, compute_dtype=dt, name="conv_4")(h)
        h = pixel_norm(_lrelu(h))

        prev = h  # always captured on the spatial grid (see below)
        h_s2d = False
        res = 8
        while res <= self.resolution:
            if h_s2d:  # previous level left us on the S2D grid
                h, h_s2d = s2d.depth_to_space(h), False
            prev = h
            use_s2d = bool(self.s2d_from) and res >= self.s2d_from
            Base = _GenBlockS2D if use_s2d else _GenBlock
            Block = (nn.remat(Base)
                     if self.remat_from and res >= self.remat_from
                     else Base)
            h = Block(nf(res, wm), dt, name=f"block_{res}")(h)
            h_s2d = use_s2d
            res *= 2

        rgb = self._torgb(h, h_s2d, self.resolution, dt)
        if self.fade_in and self.resolution > 4:
            rgb_prev = self._torgb(prev, False, self.resolution // 2, dt)
            rgb = (alpha * rgb.astype(jnp.float32)
                   + (1.0 - alpha) * upsample_nearest(rgb_prev.astype(jnp.float32)))
        return rgb.astype(jnp.float32)


class PGGANDiscriminator(nn.Module):
    resolution: int = 1024
    fade_in: bool = False
    width_mul: float = 1.0
    mbstd_group_size: int = 4
    remat_from: int = 0             # see PGGANGenerator.remat_from
    # use the fused conv+downscale (and its post-downscale lrelu, the Karras
    # fused_scale variant) at resolutions >= this (0 = never). Perf knob for
    # the 512/1024 rungs; params are unaffected.
    fused_from: int = 0
    # compute levels >= this on the space-to-depth grid (ops/s2d.py); implies
    # the fused_scale nonlinearity ordering at those levels. Exact,
    # param-compatible. 0 = off.
    s2d_from: int = 0
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, alpha=1.0):
        wm = self.width_mul
        dt = self.compute_dtype

        def s2d_at(res: int) -> bool:
            return bool(self.s2d_from) and res >= self.s2d_from

        if s2d_at(self.resolution):
            h = s2d.space_to_depth(x)
            k, b = _ConvParams(nf(self.resolution, wm), ksize=1,
                               name=f"fromrgb_{self.resolution}")(3)
            h = s2d.conv_same(h, s2d.s2d_conv_kernel(k), dt)
            h = _bias_add(h, s2d.tile_bias(b), dt)
            h_s2d = True
        else:
            h = Conv(nf(self.resolution, wm), 1, equalized=True,
                     compute_dtype=dt, name=f"fromrgb_{self.resolution}")(x)
            h_s2d = False
        h = _lrelu(h)

        res = self.resolution
        first = True
        while res > 4:
            use_s2d = s2d_at(res)
            if use_s2d and not h_s2d:
                h = s2d.space_to_depth(h)
            Base = _DiscBlockS2D if use_s2d else _DiscBlock
            Block = (nn.remat(Base)
                     if self.remat_from and res >= self.remat_from
                     else Base)
            if use_s2d:
                h = Block(nf(res, wm), nf(res // 2, wm), dt,
                          name=f"block_{res}")(h)
                h_s2d = False  # S2D blocks emit normal layout at res/2
            else:
                fused = bool(self.fused_from) and res >= self.fused_from
                h = Block(nf(res, wm), nf(res // 2, wm), fused, dt,
                          name=f"block_{res}")(h)
            if first and self.fade_in:
                skip = Conv(nf(res // 2, wm), 1, equalized=True, compute_dtype=dt,
                            name=f"fromrgb_{res // 2}")(downsample_avg(x))
                h = alpha * h.astype(jnp.float32) + (1.0 - alpha) * _lrelu(
                    skip.astype(jnp.float32))
                h = h.astype(x.dtype if dt is None else dt)
            first = False
            res //= 2

        h = minibatch_stddev(h, self.mbstd_group_size)
        h = Conv(nf(4, wm), 3, equalized=True, compute_dtype=dt, name="conv_4")(h)
        h = _lrelu(h)
        h = h.reshape(h.shape[0], -1)
        h = Dense(nf(4, wm), equalized=True, compute_dtype=dt, name="dense_4")(h)
        h = _lrelu(h)
        return Dense(1, equalized=True, gain=1.0, compute_dtype=jnp.float32,
                     name="dense_out")(h)


def migrate_params(old_params: Dict, new_params: Dict) -> Tuple[Dict, int]:
    """Cross-level growth: copy every param whose path+shape exists in both
    (the shared trunk + previous toRGB/fromRGB); keep fresh init elsewhere.
    Returns (merged_params, n_copied).

    Replaces the reference's per-level ``Saver.restore`` graph surgery
    (SURVEY.md §3.3)."""
    old_flat = flatten_dict(old_params)
    new_flat = dict(flatten_dict(new_params))
    copied = 0
    for k, v in old_flat.items():
        if k in new_flat and new_flat[k].shape == v.shape:
            new_flat[k] = v
            copied += 1
    return unflatten_dict(new_flat), copied


def make_pggan_spec(
    g_model: PGGANGenerator,
    d_model: PGGANDiscriminator,
    gp_weight: float = 10.0,
    drift_weight: float = 1e-3,
    ema_decay: float = 0.999,
) -> GANSpec:
    """WGAN-GP spec. D has no BN/SN state, so the GP critic closure is pure
    and the double-backward stays clean (SURVEY.md §7 hard part #1)."""
    z_dim = g_model.z_dim

    def d_loss(d_params, d_state, g_vars, batch, rng, alpha):
        real = batch["image"]
        n = real.shape[0]
        rng_z, rng_gp = jax.random.split(rng)
        z = jax.random.normal(rng_z, (n, z_dim))
        fake = jax.lax.stop_gradient(g_model.apply(g_vars, z, alpha))
        d_vars = {"params": d_params}
        real_logits = d_model.apply(d_vars, real, alpha)
        fake_logits = d_model.apply(d_vars, fake, alpha)
        critic = lambda x: d_model.apply(d_vars, x, alpha)
        gp = gradient_penalty(critic, real, fake, rng_gp)
        wd = wgan_d_loss(real_logits, fake_logits)
        drift = drift_penalty(real_logits)
        loss = wd + gp_weight * gp + drift_weight * drift
        metrics = {"d_loss": loss, "wdist": -wd, "gp": gp}
        return loss, (dict(d_state), metrics)

    def g_loss(g_params, g_state, d_vars, batch, rng, alpha):
        n = batch["image"].shape[0]
        z = jax.random.normal(rng, (n, z_dim))
        fake = g_model.apply({"params": g_params, **g_state}, z, alpha)
        fake_logits = d_model.apply(d_vars, fake, alpha)
        loss = wgan_g_loss(fake_logits)
        return loss, (dict(g_state), {})

    return GANSpec(d_loss=d_loss, g_loss=g_loss, n_critic=1,
                   shared_batch=True, ema_decay=ema_decay)


def make_sampler(g_model: PGGANGenerator, use_ema: bool = True):
    def sample(state, rng, n):
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.g_params
        z = jax.random.normal(rng, (n, g_model.z_dim))
        return g_model.apply({"params": params}, z, state.alpha)
    return jax.jit(sample, static_argnums=2)

"""ACGAN on CIFAR-10: small conditional DCGAN G + D with an auxiliary
classifier head (reference ``ACGAN/acgan.py`` + ``ACGAN/train.py``;
BASELINE.json marks this the single-host CPU-runnable smoke config).

Architecture (Odena et al. 2017 CIFAR variant):
  G: [z | one-hot(y)] -> Dense -> 4x4xC -> 3 x (2x ConvTranspose + BN + ReLU)
     -> tanh -> 32x32x3
  D: conv stack, stride-2 every other layer, LeakyReLU(0.2) + dropout ->
     flatten -> two heads: adversarial logit + 10-way class logits.
Losses: adversarial BCE (logit form) + cross-entropy on class logits for both
real and fake, on both players — ``loss_weights`` control the mix.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..losses import acgan_aux_loss, bce_d_loss, bce_g_loss, hinge_d_loss, hinge_g_loss
from ..ops import Conv, ConvTranspose, Dense
from ..ops.norms import BatchNorm
from ..train.step import GANSpec

Dtype = Any


class ACGANGenerator(nn.Module):
    num_classes: int = 10
    z_dim: int = 110
    base_ch: int = 384
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, labels, *, train: bool = True):
        onehot = jax.nn.one_hot(labels, self.num_classes, dtype=z.dtype)
        h = jnp.concatenate([z, onehot], axis=-1)
        h = Dense(4 * 4 * self.base_ch, compute_dtype=self.compute_dtype, name="dense")(h)
        h = h.reshape(-1, 4, 4, self.base_ch)
        h = nn.relu(h)
        for i, ch in enumerate((self.base_ch // 2, self.base_ch // 4)):
            h = ConvTranspose(ch, 5, strides=2, compute_dtype=self.compute_dtype,
                              name=f"deconv{i}")(h)
            h = BatchNorm(compute_dtype=self.compute_dtype,
                          name=f"bn{i}")(h, use_running_average=not train)
            h = nn.relu(h)
        h = ConvTranspose(3, 5, strides=2, compute_dtype=self.compute_dtype,
                          name="deconv_out")(h)
        return jnp.tanh(h.astype(jnp.float32))


class ACGANDiscriminator(nn.Module):
    num_classes: int = 10
    base_ch: int = 64
    dropout_rate: float = 0.3
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        chs = (self.base_ch, self.base_ch, self.base_ch * 2, self.base_ch * 2,
               self.base_ch * 4, self.base_ch * 4)
        strides = (2, 1, 2, 1, 2, 1)
        h = x
        for i, (ch, s) in enumerate(zip(chs, strides)):
            h = Conv(ch, 3, strides=s, compute_dtype=self.compute_dtype,
                     name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = h.reshape(h.shape[0], -1).astype(jnp.float32)
        adv = Dense(1, name="head_adv")(h)
        cls = Dense(self.num_classes, name="head_cls")(h)
        return adv, cls


def make_acgan_spec(
    g_model: ACGANGenerator,
    d_model: ACGANDiscriminator,
    adversarial: str = "bce",      # 'bce' (classic ACGAN) or 'hinge'
    aux_weight: float = 1.0,
) -> GANSpec:
    """ACGAN GANSpec: D minimizes adv(real,fake) + CE(real)+CE(fake); G
    minimizes adv(fake) + CE(fake) — both want fake images classified as their
    conditioning class (reference ACGAN/train.py semantics)."""
    adv_d = {"bce": bce_d_loss, "hinge": hinge_d_loss}[adversarial]
    adv_g = {"bce": bce_g_loss, "hinge": hinge_g_loss}[adversarial]
    z_dim = g_model.z_dim
    num_classes = g_model.num_classes

    def _fake(g_vars, rng, n, labels):
        z = jax.random.normal(rng, (n, z_dim))
        fake, _ = g_model.apply(g_vars, z, labels, train=True, mutable=["batch_stats"])
        return fake

    def d_loss(d_params, d_state, g_vars, batch, rng, alpha):
        imgs, labels = batch["image"], batch["label"]
        n = imgs.shape[0]
        rng_z, rng_l, rng_do, rng_do2 = jax.random.split(rng, 4)
        fake_labels = jax.random.randint(rng_l, (n,), 0, num_classes)
        fake = jax.lax.stop_gradient(_fake(g_vars, rng_z, n, fake_labels))
        d_vars = {"params": d_params, **d_state}
        real_adv, real_cls = d_model.apply(d_vars, imgs, train=True,
                                           rngs={"dropout": rng_do})
        fake_adv, fake_cls = d_model.apply(d_vars, fake, train=True,
                                           rngs={"dropout": rng_do2})
        adv = adv_d(real_adv, fake_adv)
        aux = acgan_aux_loss(real_cls, labels) + acgan_aux_loss(fake_cls, fake_labels)
        loss = adv + aux_weight * aux
        acc = jnp.mean((jnp.argmax(real_cls, -1) == labels).astype(jnp.float32))
        return loss, (dict(d_state), {"d_loss": loss, "d_adv": adv, "d_aux": aux,
                                      "cls_acc": acc})

    def g_loss(g_params, g_state, d_vars, batch, rng, alpha):
        n = batch["image"].shape[0]
        rng_z, rng_l, rng_do = jax.random.split(rng, 3)
        labels = jax.random.randint(rng_l, (n,), 0, num_classes)
        z = jax.random.normal(rng_z, (n, z_dim))
        fake, new_g_state = g_model.apply(
            {"params": g_params, **g_state}, z, labels, train=True,
            mutable=["batch_stats"])
        fake_adv, fake_cls = d_model.apply(d_vars, fake, train=True,
                                           rngs={"dropout": rng_do})
        adv = adv_g(fake_adv)
        aux = acgan_aux_loss(fake_cls, labels)
        loss = adv + aux_weight * aux
        return loss, (dict(new_g_state), {"g_adv": adv, "g_aux": aux})

    return GANSpec(d_loss=d_loss, g_loss=g_loss, n_critic=1, shared_batch=True)


def make_sampler(g_model: ACGANGenerator, use_ema: bool = True):
    """Sampler prefers EMA params when the state carries them — consistent
    with sngan/pggan so ``cli.sample --export-dir`` exports exactly what the
    sampled grid shows (advisor r2 finding)."""
    def sample(state, rng, n):
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.g_params
        z = jax.random.normal(rng, (n, g_model.z_dim))
        labels = jnp.arange(n) % g_model.num_classes
        return g_model.apply({"params": params, **state.g_state},
                             z, labels, train=False)
    return jax.jit(sample, static_argnums=2)

"""Adversarial + auxiliary losses (pure logit-space functions)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn


def _f32(x):
    return x.astype(jnp.float32)


# --- hinge (SNGAN, Miyato et al. 2018; reference SNGAN/train.py) -----------

def hinge_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return (jnp.mean(nn.relu(1.0 - _f32(real_logits)))
            + jnp.mean(nn.relu(1.0 + _f32(fake_logits))))


def hinge_g_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(_f32(fake_logits))


# --- Wasserstein (PGGAN's WGAN-GP base; reference PGGAN/train.py) ----------

def wgan_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(_f32(fake_logits)) - jnp.mean(_f32(real_logits))


def wgan_g_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(_f32(fake_logits))


# --- saturating BCE (pix2pix; reference pix2pix/pix2pix.py create_model) ----
# The reference uses probabilities with EPS inside log; softplus on logits is
# the stable equivalent: -log(sigmoid(x)) = softplus(-x).

def bce_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    return (jnp.mean(nn.softplus(-_f32(real_logits)))
            + jnp.mean(nn.softplus(_f32(fake_logits))))


def bce_g_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating G loss: -E[log D(fake)] (the pix2pix form)."""
    return jnp.mean(nn.softplus(-_f32(fake_logits)))


def l1_loss(target: jnp.ndarray, output: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(_f32(target) - _f32(output)))


# --- AC-GAN auxiliary classifier CE (reference ACGAN/train.py) -------------

def acgan_aux_loss(class_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sparse softmax cross-entropy, mean over batch."""
    logp = nn.log_softmax(_f32(class_logits), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

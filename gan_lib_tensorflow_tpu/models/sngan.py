"""SNGAN ResNet family: CIFAR-10 32x32 (hinge, SURVEY.md §2.2 SNGAN G/D) and
the ImageNet-128 conditional variant with projection discriminator +
conditional batch-norm (reference ``SNGAN/model_resnet.py`` and its ImageNet
sibling; pfnet-research/sngan_projection lineage).

Architecture (CIFAR, Miyato et al. 2018 ResNet):
  G: z in R^128 -> Dense -> 4x4x256 -> 3 x (up-ResBlock 256) -> BN -> ReLU ->
     3x3 conv -> tanh -> 32x32x3
  D: OptimizedBlock(128, down) -> ResBlock(128, down) -> 2 x ResBlock(128) ->
     ReLU -> global SUM pool -> SN-Dense(1).  All D weights spectral-normed.

ImageNet-128 conditional (SNGAN-projection):
  G: Dense -> 4x4x1024 -> up-blocks (1024,512,256,128,64) with cond-BN on the
     class label -> BN-ReLU-conv-tanh -> 128x128x3
  D: OptimizedBlock(64) -> down-blocks (128,256,512,1024) -> ResBlock(1024) ->
     ReLU -> sum-pool phi -> SN-Dense(1) + <SN-embed(y), phi>   (projection)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..losses import hinge_d_loss, hinge_g_loss
from ..ops import (
    Conv,
    Dense,
    DiscOptimizedBlock,
    DiscResBlock,
    Embedding,
    GenResBlock,
    global_sum_pool,
)
from ..ops.norms import BatchNorm
from ..train.step import GANSpec

Dtype = Any


class ResNetGenerator(nn.Module):
    channels: Tuple[int, ...] = (256, 256, 256)
    bottom_ch: int = 256
    bottom: int = 4
    z_dim: int = 128
    num_classes: int = 0          # >0 => conditional BN in every block
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, labels=None, *, train: bool = True):
        h = Dense(self.bottom * self.bottom * self.bottom_ch,
                  compute_dtype=self.compute_dtype, name="dense")(z)
        h = h.reshape(-1, self.bottom, self.bottom, self.bottom_ch)
        for i, ch in enumerate(self.channels):
            h = GenResBlock(
                ch, upsample=True, num_classes=self.num_classes,
                compute_dtype=self.compute_dtype,
                name=f"block{i}")(h, labels, train=train)
        h = BatchNorm(compute_dtype=self.compute_dtype,
                      name="bn_out")(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(3, 3, compute_dtype=self.compute_dtype, name="conv_out")(h)
        return jnp.tanh(h.astype(jnp.float32))


class ResNetDiscriminator(nn.Module):
    """``fused=True`` (default) computes every down-block's conv2-then-pool as
    one stride-2 conv with the smeared SN'd kernel and commutes the 1x1 skip
    conv past the pool — algebraically exact, ~2.25x fewer MACs on the fused
    convs, identical params/checkpoints (ops/blocks.py)."""

    channels: Tuple[int, ...] = (128, 128, 128, 128)
    downsample: Tuple[bool, ...] = (True, True, False, False)
    num_classes: int = 0          # >0 => projection discriminator
    fused: bool = True
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, labels=None, *, update_sn: bool = False):
        if len(self.channels) != len(self.downsample):
            raise ValueError(
                f"channels ({len(self.channels)}) and downsample "
                f"({len(self.downsample)}) must have equal length")
        # the input block always downsamples (reference OptimizedBlock);
        # downsample[0] exists only to keep the tuples aligned
        h = DiscOptimizedBlock(self.channels[0], fused=self.fused,
                               compute_dtype=self.compute_dtype,
                               name="block0")(x, update_sn=update_sn)
        for i, (ch, down) in enumerate(zip(self.channels[1:], self.downsample[1:])):
            h = DiscResBlock(ch, downsample=down, fused=self.fused,
                             compute_dtype=self.compute_dtype,
                             name=f"block{i + 1}")(h, update_sn=update_sn)
        h = nn.relu(h)
        phi = global_sum_pool(h).astype(jnp.float32)
        out = Dense(1, spectral_norm=True, compute_dtype=jnp.float32,
                    name="dense_out")(phi, update_sn=update_sn)
        if self.num_classes > 0:
            emb = Embedding(self.num_classes, phi.shape[-1], spectral_norm=True,
                            name="proj_embed")(labels, update_sn=update_sn)
            out = out + jnp.sum(emb.astype(jnp.float32) * phi, axis=-1, keepdims=True)
        return out


def cifar_generator(compute_dtype=None, num_classes: int = 0) -> ResNetGenerator:
    return ResNetGenerator(num_classes=num_classes, compute_dtype=compute_dtype)


def cifar_discriminator(compute_dtype=None, num_classes: int = 0) -> ResNetDiscriminator:
    return ResNetDiscriminator(num_classes=num_classes, compute_dtype=compute_dtype)


def _scale_channels(chs, width_mul: float):
    return tuple(max(int(c * width_mul), 8) for c in chs)


def imagenet128_generator(compute_dtype=None, num_classes: int = 1000,
                          width_mul: float = 1.0) -> ResNetGenerator:
    """128^2 projection-SNGAN G (reference config). ``width_mul`` scales all
    channel counts (1.0 = reference width; small values for tests/low-mem)."""
    chs = _scale_channels((1024, 512, 256, 128, 64), width_mul)
    return ResNetGenerator(
        channels=chs, bottom_ch=chs[0],
        num_classes=num_classes, compute_dtype=compute_dtype)


def imagenet128_discriminator(compute_dtype=None, num_classes: int = 1000,
                              width_mul: float = 1.0) -> ResNetDiscriminator:
    return ResNetDiscriminator(
        channels=_scale_channels((64, 128, 256, 512, 1024, 1024), width_mul),
        downsample=(True, True, True, True, True, False),
        num_classes=num_classes, compute_dtype=compute_dtype)


def make_sngan_spec(
    g_model: ResNetGenerator,
    d_model: ResNetDiscriminator,
    n_critic: int = 5,
    ema_decay: float = 0.0,
) -> GANSpec:
    """Hinge-loss GANSpec for (conditional) SNGAN.

    Reference semantics (SNGAN/train.py): each of the 5 critic steps draws a
    fresh real batch and fresh z; the G step draws fresh z (and, conditional,
    fresh uniform labels). SN u-vectors advance only inside d_loss.
    """
    conditional = g_model.num_classes > 0
    z_dim = g_model.z_dim

    def _fake(g_vars, rng, n, labels, train=True):
        z = jax.random.normal(rng, (n, z_dim))
        args = (z, labels) if conditional else (z,)
        fake, _ = g_model.apply(g_vars, *args, train=train, mutable=["batch_stats"])
        return fake

    def _rand_labels(rng, n):
        return jax.random.randint(rng, (n,), 0, g_model.num_classes)

    def prepare_d_batches(g_vars, d_batches, rng, alpha):
        """Generate ALL critic-substep fakes in one vmapped G forward.

        G params don't change during the critic loop, so this is exactly the
        per-substep computation; vmap over the n_critic axis keeps BN batch
        stats per-microbatch (reference semantics) while XLA batches the conv
        work across substeps (~5x generator MXU utilization)."""
        n_critic, n = jax.tree_util.tree_leaves(d_batches)[0].shape[:2]
        rngs = jax.random.split(rng, n_critic)

        def gen_one(r):
            rz, rl = jax.random.split(r)
            labels = _rand_labels(rl, n) if conditional else None
            fake = _fake(g_vars, rz, n, labels)
            return (fake, labels) if conditional else (fake, jnp.zeros((n,), jnp.int32))

        fakes, fake_labels = jax.vmap(gen_one)(rngs)
        out = dict(d_batches)
        out["fake"] = jax.lax.stop_gradient(fakes)
        if conditional:
            out["fake_label"] = fake_labels
        return out

    def d_loss(d_params, d_state, g_vars, batch, rng, alpha):
        imgs = batch["image"]
        n = imgs.shape[0]
        rng_z, rng_l = jax.random.split(rng)
        if conditional and "label" not in batch:
            raise ValueError("conditional SNGAN needs a 'label' key in the "
                             "data batch (class-labeled source)")
        real_labels = batch.get("label") if conditional else None
        if "fake" in batch:
            fake = batch["fake"]
            fake_labels = batch.get("fake_label") if conditional else None
        else:
            fake_labels = _rand_labels(rng_l, n) if conditional else None
            fake = jax.lax.stop_gradient(_fake(g_vars, rng_z, n, fake_labels))
        d_vars = {"params": d_params, **d_state}
        # One D pass over [real; fake]: D is per-sample (SN only, no BN), so
        # this is mathematically identical to two passes but doubles the MXU
        # batch and runs exactly ONE power-iteration u update per critic step
        # (the reference's per-step sn_update_ops semantics).
        both = jnp.concatenate([imgs, fake], axis=0)
        both_labels = (jnp.concatenate([real_labels, fake_labels], axis=0)
                       if conditional else None)
        logits, new_state = d_model.apply(
            d_vars, both, both_labels, update_sn=True, mutable=["sn"])
        real_logits, fake_logits = logits[:n], logits[n:]
        loss = hinge_d_loss(real_logits, fake_logits)
        metrics = {"d_loss": loss,
                   "d_real": jnp.mean(real_logits), "d_fake": jnp.mean(fake_logits)}
        return loss, (dict(new_state), metrics)

    def g_loss(g_params, g_state, d_vars, batch, rng, alpha):
        n = batch["image"].shape[0]
        rng_z, rng_l = jax.random.split(rng)
        labels = _rand_labels(rng_l, n) if conditional else None
        z = jax.random.normal(rng_z, (n, z_dim))
        args = (z, labels) if conditional else (z,)
        fake, new_g_state = g_model.apply(
            {"params": g_params, **g_state}, *args, train=True,
            mutable=["batch_stats"])
        fake_logits = d_model.apply(d_vars, fake, labels, update_sn=False)
        loss = hinge_g_loss(fake_logits)
        return loss, (dict(new_g_state), {})

    return GANSpec(d_loss=d_loss, g_loss=g_loss,
                   prepare_d_batches=prepare_d_batches, n_critic=n_critic,
                   shared_batch=True, ema_decay=ema_decay)


def make_sampler(g_model: ResNetGenerator, use_ema: bool = True):
    """Jitted fixed-noise sampler for grids/eval (reference: restore -> run G
    on fixed z, SURVEY.md §3.5).

    Sampling semantics (deliberate, tested in tests/test_models.py):
    ``use_ema=True`` pairs the EMA'd generator params with the TRAINING
    run's BatchNorm running stats (``state.g_state``) at ``train=False``.
    The running stats are themselves a momentum-EMA of activation
    statistics, tracked for the raw (non-EMA) G — the universal pairing in
    EMA-sampling GAN implementations (BigGAN lineage); maintaining a second
    stats collection for the EMA G would double BN state for no measured
    benefit. The reference SNGAN has NO EMA at all (SURVEY §2.4): pass
    ``--ema-decay 0`` on the CLI (ema_params=None -> this sampler falls
    back to raw g_params) for strict reference-output parity; the 0.9999
    default is a documented improvement on the FID path."""

    def sample(state, rng, n):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.g_params
        z = jax.random.normal(rng, (n, g_model.z_dim))
        if g_model.num_classes > 0:
            labels = jnp.arange(n) % g_model.num_classes
            return g_model.apply({"params": params, **state.g_state}, z, labels, train=False)
        return g_model.apply({"params": params, **state.g_state}, z, train=False)

    return jax.jit(sample, static_argnums=2)

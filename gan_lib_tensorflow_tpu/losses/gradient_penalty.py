"""WGAN-GP gradient penalty — double-backward fully on device.

Reference: PGGAN/train.py computes ``tf.gradients(D(x_hat), x_hat)`` inside the
graph, i.e. a second-order backward through D when differentiating the D loss.
Here the inner gradient is an explicit ``jax.grad`` over the interpolated
batch; XLA compiles the whole double-backward into the fused train step.

Design constraint (SURVEY.md §7 hard part #1): the critic function passed in
must be *pure* w.r.t. the interpolates — no BN batch stats (WGAN-GP critics in
the reference lineage use LayerNorm or no norm), and spectral-norm u vectors
must be held constant (stop-gradiented) inside ``critic_fn``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def gradient_penalty(
    critic_fn: Callable[[jnp.ndarray], jnp.ndarray],
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
    target: float = 1.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """E[(||d critic / d x_hat||_2 - target)^2] on u~U[0,1] interpolates.

    ``critic_fn`` maps a batch [N, ...] to per-sample scalars [N] (or [N, 1]).
    """
    n = real.shape[0]
    u = jax.random.uniform(rng, (n,) + (1,) * (real.ndim - 1), dtype=jnp.float32)
    x_hat = u * real.astype(jnp.float32) + (1.0 - u) * fake.astype(jnp.float32)

    def scalar_sum(x):
        out = critic_fn(x)
        return jnp.sum(out.astype(jnp.float32))

    grads = jax.grad(scalar_sum)(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.astype(jnp.float32)),
                             axis=tuple(range(1, grads.ndim))) + eps)
    return jnp.mean(jnp.square(norms - target))


def drift_penalty(real_logits: jnp.ndarray) -> jnp.ndarray:
    """PGGAN's epsilon-drift term: E[D(x)^2], keeps critic outputs from
    drifting (Karras et al. 2018 A.1; weight 1e-3 in the reference)."""
    return jnp.mean(jnp.square(real_logits.astype(jnp.float32)))

"""Spectral normalization with functional power-iteration state.

Reference behavior (``SNGAN/sn.py`` — ``spectral_normed_weight(W, u,
num_iters=1, update_collection, with_sigma)`` in the
minhnhat93/tf-SNDCGAN lineage used by watsonyanghx/GAN_Lib_Tensorflow):

* reshape W to ``[-1, out_dim]``
* one step of power iteration: ``v = l2norm(u W^T)``, ``u = l2norm(v W)``
* ``sigma = v W u^T``; return ``W / sigma``
* ``u`` is a non-trainable variable whose update is routed through a TF1
  update collection (``SPECTRAL_NORM_UPDATE_OPS``) so it only advances on
  discriminator steps; ``tf.stop_gradient`` is applied to u and v so the
  gradient of ``W/sigma`` flows through W alone.

TPU-native redesign: there is no global collection. ``u`` lives in the ``'sn'``
flax variable collection of the owning module, making it an explicit leaf of
the train-state pytree. The caller decides when it advances by applying the
module with ``mutable=['sn']`` (D updates) or not (G updates, eval) — the
``update`` flag must mirror that choice. The power step is two tiny matvecs
that XLA fuses into the surrounding program; for the many-small-weights case a
batched Pallas variant lives in ``ops.pallas_kernels``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x)) + eps)


def power_iteration(w_mat: jnp.ndarray, u: jnp.ndarray, n_iters: int = 1):
    """Run ``n_iters`` steps of power iteration on ``w_mat`` ([fan_in, out]).

    Returns ``(sigma, u_new)`` where ``sigma`` is the top-singular-value
    estimate. u and v are stop-gradiented: d(sigma)/dW = u v^T only.
    """
    if n_iters < 1:
        raise ValueError(f"power_iteration needs n_iters >= 1, got {n_iters}")
    v = None
    for _ in range(n_iters):
        v = _l2_normalize(u @ w_mat.T)  # [1, fan_in]
        u = _l2_normalize(v @ w_mat)    # [1, out]
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = jnp.squeeze(v @ w_mat @ u.T)
    return sigma, u


def spectral_normalize(
    mdl: nn.Module,
    w: jnp.ndarray,
    update: bool,
    n_iters: int = 1,
    name: str = "u",
) -> jnp.ndarray:
    """Normalize kernel ``w`` by its spectral norm, tracking ``u`` in the
    module's ``'sn'`` collection.

    Args:
      mdl: the flax module that owns the kernel (called from inside
        ``@nn.compact``).
      w: kernel of any rank; reshaped to ``[-1, out]`` like the reference.
      update: write the advanced ``u`` back (requires ``mutable=['sn']`` at
        apply time). Pass True on D optimization steps only.
      n_iters: power-iteration steps per call (reference default: 1).
      name: variable name (kernels sharing a module need distinct names).
    """
    out_dim = w.shape[-1]
    w_mat = w.reshape(-1, out_dim)
    u_var = mdl.variable(
        "sn", name,
        lambda: jax.random.normal(mdl.make_rng("params"), (1, out_dim), jnp.float32),
    )
    sigma, u_new = power_iteration(w_mat, u_var.value, n_iters=n_iters)
    if update and not mdl.is_initializing():
        u_var.value = u_new
    return w / sigma

"""The fused n_critic*D + G train step — one XLA program per iteration.

Reference hot loop (SURVEY.md §3.1): a host Python loop issuing 5 separate
``sess.run(d_train_op)`` calls + 1 ``sess.run(g_train_op)``, re-copying a
feed_dict batch each time. TPU-native replacement: ALL critic updates, the
generator update, spectral-norm u advances, EMA, and metric reduction execute
in a single jitted call over a ``[n_micro, B, ...]`` microbatch stack
(``lax.scan`` over the critic updates), with the state pytree donated so
params update in place in HBM.

Model families plug in via ``GANSpec`` — two pure loss closures that own all
model-specific structure (aux classifier heads, paired inputs, gradient
penalty double-backward), so this file stays model-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import GANTrainState, g_variables

# d_loss / g_loss signature:
#   (params, model_state, other_net_variables, batch, rng, alpha)
#     -> (loss, (new_model_state, metrics_dict))
LossFn = Callable[..., Tuple[jnp.ndarray, Tuple[Any, Dict[str, jnp.ndarray]]]]


@dataclasses.dataclass(frozen=True)
class GANSpec:
    """Everything the generic trainer needs to know about a model family."""

    d_loss: LossFn
    g_loss: LossFn
    # Optional hook run ONCE before the critic scan:
    #   (g_vars, d_batches, rng, alpha) -> d_batches
    # G params are constant across the n_critic substeps, so model families
    # can precompute all fake microbatches in one big (vmapped) G forward —
    # ~5x better generator MXU utilization than re-running G inside each
    # substep, with identical math (see models.sngan).
    prepare_d_batches: Optional[Callable] = None
    n_critic: int = 1
    # If True the G update consumes the same (last) microbatch as the final D
    # update (all current families; conditional variants sample fresh labels
    # rather than reading them from a batch); if False the stack carries one
    # extra microbatch reserved for G losses that need real data of their own.
    shared_batch: bool = True
    ema_decay: float = 0.0

    @property
    def n_micro(self) -> int:
        return self.n_critic if self.shared_batch else self.n_critic + 1


def make_train_step(
    spec: GANSpec,
    g_optim: optax.GradientTransformation,
    d_optim: optax.GradientTransformation,
):
    """Build the fused step: (state, batch_stack) -> (state, metrics)."""

    def train_step(state: GANTrainState, batch_stack: Any):
        for leaf in jax.tree_util.tree_leaves(batch_stack):
            if leaf.shape[0] != spec.n_micro:
                raise ValueError(
                    f"batch_stack leaves must be [n_micro={spec.n_micro}, B, ...] "
                    f"stacks (see data.microbatch_stack); got leading dim "
                    f"{leaf.shape[0]} in shape {leaf.shape}")
        if spec.ema_decay > 0 and state.ema_params is None:
            raise ValueError(
                "spec.ema_decay > 0 but state.ema_params is None — pass "
                "ema_decay to create_state() as well")
        d_batches = jax.tree_util.tree_map(lambda x: x[: spec.n_critic], batch_stack)
        g_batch = jax.tree_util.tree_map(lambda x: x[-1], batch_stack)
        g_vars = g_variables(state)

        prep_rng = None
        if spec.prepare_d_batches is not None:
            prep_rng = jax.random.fold_in(state.rng, 1)
            d_batches = spec.prepare_d_batches(g_vars, d_batches, prep_rng,
                                               state.alpha)

        def d_substep(carry, micro):
            d_params, d_state, d_opt, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, (new_d_state, metrics)), grads = jax.value_and_grad(
                spec.d_loss, has_aux=True
            )(d_params, d_state, g_vars, micro, sub, state.alpha)
            updates, d_opt = d_optim.update(grads, d_opt, d_params)
            d_params = optax.apply_updates(d_params, updates)
            return (d_params, new_d_state, d_opt, rng), metrics

        (d_params, d_state, d_opt, rng), d_metrics = jax.lax.scan(
            d_substep,
            (state.d_params, state.d_state, state.d_opt, state.rng),
            d_batches,
        )
        # Report the last critic substep's metrics (what the reference logs).
        d_metrics = jax.tree_util.tree_map(lambda x: x[-1], d_metrics)

        d_vars = {"params": d_params, **d_state}  # post-critic-scan variables
        rng, sub, next_rng = jax.random.split(rng, 3)
        (g_loss_val, (new_g_state, g_metrics)), g_grads = jax.value_and_grad(
            spec.g_loss, has_aux=True
        )(state.g_params, state.g_state, d_vars, g_batch, sub, state.alpha)
        g_updates, g_opt = g_optim.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        ema_params = state.ema_params
        if spec.ema_decay > 0 and ema_params is not None:
            d_ = spec.ema_decay
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * d_ + p * (1.0 - d_), ema_params, g_params
            )

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, g_state=new_g_state,
            d_params=d_params, d_state=d_state,
            g_opt=g_opt, d_opt=d_opt,
            ema_params=ema_params, rng=next_rng,
        )
        metrics = {**d_metrics, **g_metrics, "g_loss": g_loss_val}
        return new_state, metrics

    return train_step


def jit_train_step(
    spec: GANSpec,
    g_optim,
    d_optim,
    mesh=None,
    state_shardings=None,
):
    """Jit the fused step with state donated.

    Under a mesh, the BATCH layout is entirely the caller's job
    (``parallel.shard_batch`` / ``prefetch_to_device``): batch dim over 'data'
    (DP — XLA inserts the gradient psum) and optionally image height over an
    'sp' axis (GSPMD spatial partitioning with automatic halo exchange — the
    high-res PGGAN path).

    ``state_shardings`` pins the STATE layout explicitly — a pytree of
    ``NamedSharding`` matching the state (``parallel.train_state_shardings``
    builds the DP x TP one: wide kernels + their Adam slots + EMA sharded on
    the 'model' axis). Default ``None`` = fully replicated, the pure-DP
    layout every headline config uses. GSPMD propagates the rest from the
    committed input shardings.
    """
    fn = make_train_step(spec, g_optim, d_optim)
    if mesh is not None and state_shardings is not None:
        base = fn

        def fn(state, batch):
            new_state, metrics = base(state, batch)
            # pin the OUTPUT state to the same layout: without this GSPMD
            # picks its own output shardings (it happily shards an RGB conv
            # on its input-channel dim), so step outputs would drift from
            # the declared layout and every next call would relayout the
            # donated state
            return jax.lax.with_sharding_constraint(
                new_state, state_shardings), metrics

    step = jax.jit(fn, donate_argnums=0)
    if mesh is None:
        return step
    from jax.sharding import NamedSharding, PartitionSpec as P

    layout = (NamedSharding(mesh, P()) if state_shardings is None
              else state_shardings)

    def wrapped(state, batch):
        # no-op when already laid out (device_put short-circuits on matching
        # shardings), so this only costs on the first call / after restore
        state = jax.device_put(state, layout)
        return step(state, batch)

    return wrapped

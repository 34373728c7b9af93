"""Train state: one explicit pytree replacing all TF1 cross-cutting state.

The reference scatters mutable state across the TF1 default graph: trainable
variable collections per network, spectral-norm u-vector update collections,
BN moving averages, Adam slots, the global step (SURVEY.md §1). Here all of it
is one ``GANTrainState`` pytree — jit-donatable, orbax-serializable, and
shardable leaf by leaf.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GANTrainState:
    step: jax.Array                       # int32 scalar
    g_params: Any
    g_state: Any                          # e.g. {'batch_stats': ...}
    d_params: Any
    d_state: Any                          # e.g. {'sn': ...}
    g_opt: Any
    d_opt: Any
    ema_params: Optional[Any]             # EMA of g_params (None if disabled)
    rng: jax.Array
    # Schedule scalars traced into the step (PGGAN fade-in alpha; unused
    # models carry 1.0). Keeping it in-state avoids recompiles per alpha.
    alpha: jax.Array = struct.field(default_factory=lambda: jnp.float32(1.0))


@struct.dataclass
class EvalState:
    """Inference-side view of a checkpoint: just what samplers need. Built
    from ``CheckpointManager.restore_latest_raw`` so evaluation never depends
    on the training run's optimizer-state layout."""

    step: jax.Array
    g_params: Any
    g_state: Any
    ema_params: Optional[Any]
    alpha: jax.Array


def eval_state_from_raw(raw: dict) -> EvalState:
    return EvalState(
        step=raw["step"],
        g_params=raw["g_params"],
        g_state=raw.get("g_state") or {},
        ema_params=raw.get("ema_params"),
        alpha=raw.get("alpha", jnp.float32(1.0)),
    )


def create_state(
    rng: jax.Array,
    g_init: Callable[..., Any],
    d_init: Callable[..., Any],
    g_optim,
    d_optim,
    ema_decay: float = 0.0,
) -> GANTrainState:
    """Initialize from flax ``init`` outputs.

    ``g_init``/``d_init`` are thunks returning the full flax variables dict
    (called with an rng); non-'params' collections become g_state/d_state.
    """
    g_rng, d_rng, loop_rng = jax.random.split(rng, 3)
    g_vars = dict(g_init(g_rng))
    d_vars = dict(d_init(d_rng))
    g_params = g_vars.pop("params")
    d_params = d_vars.pop("params")
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_state=g_vars,
        d_params=d_params,
        d_state=d_vars,
        g_opt=g_optim.init(g_params),
        d_opt=d_optim.init(d_params),
        ema_params=jax.tree_util.tree_map(jnp.copy, g_params) if ema_decay > 0 else None,
        rng=loop_rng,
    )


def g_variables(state: GANTrainState) -> dict:
    return {"params": state.g_params, **state.g_state}


def d_variables(state: GANTrainState) -> dict:
    return {"params": state.d_params, **state.d_state}

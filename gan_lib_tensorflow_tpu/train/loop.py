"""Generic training loop driving the fused step.

Replaces each reference train script's hand-rolled host loop (SURVEY.md §1 L4:
"nothing reusable — this is the layer the new framework must invent"). The
loop owns: device prefetch, periodic flush/sample/checkpoint, NaN guard,
auto-resume, and optional profiler capture. Model specifics live entirely in
the GANSpec + sample callback.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.base import DataSource, microbatch_stack
from ..parallel import prefetch_to_device
from ..utils.logging import ScalarLogger
from ..utils.profiler import maybe_trace
from .checkpoint import CheckpointManager
from .state import GANTrainState


@dataclasses.dataclass
class LoopConfig:
    total_steps: int = 100_000
    log_every: int = 100
    sample_every: int = 1000
    checkpoint_every: int = 5000
    eval_every: int = 0              # 0 = no periodic eval
    out_dir: Optional[str] = None
    curves: bool = False
    tensorboard: bool = False
    trace_dir: Optional[str] = None
    trace_steps: int = 0             # capture a trace for steps [10, 10+n)
    fault_inject_step: int = 0       # crash at this step (resume testing)


# Markers identifying backend faults that are worth retrying: tunnel/RPC drops
# surface as JaxRuntimeErrors whose status line starts with INTERNAL:/
# UNAVAILABLE:/DEADLINE_EXCEEDED: (e.g. "INTERNAL: ... remote_compile: read
# body: response body closed" — the exact error that killed a 100k-step run at
# 67.5k during an eval pause). Status names are matched as LINE PREFIXES, not
# substrings, so a deterministic program error merely mentioning "INTERNAL" in
# its payload still propagates; the tunnel-transport markers below are matched
# anywhere because they only ever come from the RPC layer.
_TRANSIENT_STATUS_PREFIXES = (
    "INTERNAL:", "UNAVAILABLE:", "DEADLINE_EXCEEDED:",
)
_TRANSIENT_TRANSPORT_MARKERS = (
    "remote_compile", "response body closed", "Connection reset",
)
_AUX_RETRIES = 2
_AUX_BACKOFF_S = 30.0
# A fault that survives retries on this many CONSECUTIVE invocations of the
# same callback kind is not transient — a persistently failing eval must not
# be silently skipped for the rest of a 100k-step run (ADVICE r4).
_AUX_MAX_CONSECUTIVE_SKIPS = 3


def _is_transient(msg: str) -> bool:
    if any(m in msg for m in _TRANSIENT_TRANSPORT_MARKERS):
        return True
    return any(line.lstrip().startswith(p)
               for line in msg.splitlines()
               for p in _TRANSIENT_STATUS_PREFIXES)


def _run_aux(label: str, fn: Callable[[], Any],
             skip_counts: Optional[dict] = None,
             logger: Optional[ScalarLogger] = None,
             step: int = 0) -> Any:
    """Run an auxiliary (non-training) callback — periodic eval or sample.

    A transient backend fault here must not kill the run: the training state
    is intact on device and checkpoints bound the loss, so the right policy is
    retry-with-backoff, then loudly skip this one eval/sample (recorded in the
    JSONL log, not just stdout). Returns None on skip. If the same callback
    kind skips ``_AUX_MAX_CONSECUTIVE_SKIPS`` times in a row the fault is
    treated as deterministic and re-raised — retry-forever would silently
    disable all periodic evals for the rest of the run.
    """
    kind = label.split("@", 1)[0]
    for attempt in range(_AUX_RETRIES + 1):
        try:
            result = fn()
            if skip_counts is not None:
                skip_counts[kind] = 0
            return result
        except jax.errors.JaxRuntimeError as e:  # pragma: no branch
            msg = str(e)
            if not _is_transient(msg):
                raise
            first_line = msg.splitlines()[0] if msg else repr(e)
            if attempt == _AUX_RETRIES:
                n_skips = 1
                if skip_counts is not None:
                    n_skips = skip_counts[kind] = skip_counts.get(kind, 0) + 1
                if n_skips >= _AUX_MAX_CONSECUTIVE_SKIPS:
                    print(f"[loop] {label} failed on {n_skips} consecutive "
                          f"invocations — treating as deterministic, "
                          f"re-raising", flush=True)
                    raise
                print(f"[loop] {label} SKIPPED after {attempt + 1} transient "
                      f"backend failures: {first_line}", flush=True)
                if logger is not None:
                    logger.flush(step, extra={f"aux_skip/{kind}": float(n_skips)})
                return None
            print(f"[loop] transient backend failure in {label} "
                  f"(attempt {attempt + 1}/{_AUX_RETRIES + 1}): {first_line}; "
                  f"retrying in {_AUX_BACKOFF_S:.0f}s", flush=True)
            time.sleep(_AUX_BACKOFF_S)


def train_loop(
    state: GANTrainState,
    step_fn: Callable,
    source: DataSource,
    n_micro: int,
    config: LoopConfig,
    mesh=None,
    sample_fn: Optional[Callable[[GANTrainState, int], None]] = None,
    ckpt: Optional[CheckpointManager] = None,
    logger: Optional[ScalarLogger] = None,
    alpha_fn: Optional[Callable[[int], float]] = None,
    spatial_axis: Optional[str] = None,
    eval_fn: Optional[Callable[[GANTrainState, int], dict]] = None,
) -> GANTrainState:
    logger = logger or ScalarLogger(config.out_dir, curves=config.curves,
                                    tensorboard=config.tensorboard)

    if ckpt is not None:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = restored
            print(f"resumed from step {int(state.step)}", flush=True)

    start_step = int(state.step)
    if hasattr(source, "set_stream_position"):
        # counter-based device sources: prime so post-resume batches match an
        # uninterrupted run (one batch per step; VERDICT r2 item #8)
        source.set_stream_position(start_step)
    if getattr(source, "yields_stacks", False):
        # device-resident source (e.g. DeviceFakeImages): already stacked,
        # nothing to transfer
        batches = iter(source)
    else:
        batches = prefetch_to_device(
            microbatch_stack(source, n_micro), mesh, leading_stack_dims=1,
            spatial_axis=spatial_axis)

    metrics = None
    trace_active = False
    aux_skips: dict = {}
    for step, batch in zip(range(start_step, config.total_steps), batches):
        if config.trace_steps and step == start_step + 10:
            jax.profiler.start_trace(config.trace_dir or (config.out_dir or ".") + "/trace")
            trace_active = True
        if alpha_fn is not None:
            # PGGAN fade-in: alpha is a traced state scalar — updating it does
            # NOT recompile the step (SURVEY.md §5 long-context row).
            state = state.replace(alpha=jnp.float32(alpha_fn(step)))
        state, metrics = step_fn(state, batch)
        if trace_active and step == start_step + 10 + config.trace_steps:
            jax.block_until_ready(metrics)
            jax.profiler.stop_trace()
            trace_active = False

        if config.fault_inject_step and step + 1 == config.fault_inject_step:
            raise RuntimeError(f"fault injected at step {step + 1}")

        it = step + 1
        if it % config.log_every == 0 or it == config.total_steps:
            host_metrics = {k: float(v) for k, v in metrics.items()}
            if not all(np.isfinite(list(host_metrics.values()))):
                raise FloatingPointError(f"non-finite metrics at step {it}: {host_metrics}")
            logger.log(it, host_metrics)
            logger.flush(it)
        if sample_fn is not None and (it % config.sample_every == 0 or it == config.total_steps):
            _run_aux(f"sample@{it}", lambda: sample_fn(state, it),
                     skip_counts=aux_skips, logger=logger, step=it)
        if (eval_fn is not None and config.eval_every
                and (it % config.eval_every == 0 or it == config.total_steps)):
            # periodic IS/FID pause, like the reference's every-N-iter eval
            scores = _run_aux(f"eval@{it}", lambda: eval_fn(state, it),
                              skip_counts=aux_skips, logger=logger, step=it)
            if scores is not None:
                logger.flush(it, extra=scores)
        if ckpt is not None and (it % config.checkpoint_every == 0 or it == config.total_steps):
            ckpt.save(it, state)

    if trace_active:
        # trace window outlived the loop — finalize so the profile isn't lost
        jax.profiler.stop_trace()
    if ckpt is not None:
        ckpt.wait()
    return state

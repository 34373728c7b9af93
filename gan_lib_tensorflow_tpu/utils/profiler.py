"""Profiling hooks: step timing + optional XLA trace capture.

The reference has no profiling at all (SURVEY.md §5); the primary metric here
is images/sec/chip for the fused G+D step, so timing is first-class.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def hard_sync(tree) -> None:
    """Force completion by pulling one scalar leaf to host.

    ``jax.block_until_ready`` returns early on some remote/tunneled PJRT
    backends (observed on the axon TPU plugin: per-step times 20x too fast
    under block_until_ready, honest under a host transfer). A device_get of a
    value data-dependent on the whole computation is the reliable barrier.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        jax.device_get(leaves[0])


class StepTimer:
    """Wall-clock images/sec with proper device synchronization."""

    def __init__(self, images_per_step: int, n_chips: Optional[int] = None):
        self.images_per_step = images_per_step
        self.n_chips = n_chips or jax.device_count()
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self, sync_on=None):
        if sync_on is not None:
            hard_sync(sync_on)
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    def stop(self, sync_on) -> dict:
        hard_sync(sync_on)
        dt = time.perf_counter() - self._t0
        ips = self._steps * self.images_per_step / dt
        return {
            "steps": self._steps,
            "seconds": dt,
            "sec_per_step": dt / max(self._steps, 1),
            "images_per_sec": ips,
            "images_per_sec_per_chip": ips / self.n_chips,
        }


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """``jax.profiler`` trace behind a flag (SURVEY.md §5 tracing plan)."""
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield

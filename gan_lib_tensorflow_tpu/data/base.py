"""Dataset interface + microbatch stacking for the fused train step."""

from __future__ import annotations

import abc
from typing import Any, Dict, Iterator

import numpy as np


class DataSource(abc.ABC):
    """An infinite, resumable-by-seed iterator of host numpy batches.

    Batches are dicts of numpy arrays; by convention ``image`` is NHWC float32
    in [-1, 1] and ``label`` (if present) int32.
    """

    batch_size: int

    @abc.abstractmethod
    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        ...

    def reseeded(self, seed: int) -> "DataSource":
        """A shallow copy with a different random stream (used by
        ThreadedSource workers to keep per-worker streams disjoint). Wrapper
        sources must override to reseed what they wrap."""
        import copy
        src = copy.copy(self)
        if hasattr(src, "seed"):
            src.seed = seed
        return src


def microbatch_stack(source: DataSource, n_micro: int) -> Iterator[Dict[str, np.ndarray]]:
    """Stack ``n_micro`` consecutive batches along a new leading axis.

    The fused train step consumes ``[n_micro, B, ...]`` so that all n_critic D
    updates (+ optionally the G update's batch) happen inside ONE jitted call
    — SURVEY.md §7 hard part #6.
    """
    if n_micro == 1:
        for b in source:
            yield {k: v[None] for k, v in b.items()}
        return
    it = iter(source)
    while True:
        batches = [next(it) for _ in range(n_micro)]
        yield {k: np.stack([b[k] for b in batches]) for k in batches[0]}

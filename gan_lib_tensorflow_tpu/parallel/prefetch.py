"""Host->HBM prefetch: double-buffered device_put so input never stalls compute.

Replaces the reference's per-``sess.run`` feed_dict copy (SURVEY.md §3.1 notes
it re-copies the batch every critic step). ``jax.device_put`` is async; keeping
``depth`` batches in flight overlaps the H2D DMA of batch k+1 with the compute
of batch k.
"""

from __future__ import annotations

import collections
from typing import Any, Iterator, Optional

import jax
from jax.sharding import Mesh

from .sharding import shard_batch


@jax.jit
def _u8_normalize(x):
    """On-device uint8 -> float32 [-1, 1], bit-identical to
    ``data.native.gather_normalize``. Elementwise, so under GSPMD it keeps
    whatever sharding the transferred uint8 buffer has."""
    import jax.numpy as jnp
    return x.astype(jnp.float32) * (1.0 / 127.5) - 1.0


def _normalize_u8_leaves(batch):
    """Normalize any uint8 image leaves of a device batch on-accelerator.

    Sources with ``wire_dtype="uint8"`` (PackedImageStore streaming mode) ship
    raw bytes — 4x fewer over the host->device link (the measured ~35-40 MB/s
    tunnel law, docs/PERF.md) — and the cast+scale runs at HBM speed here.
    Integer label/index leaves are untouched (they are int32 by convention).
    """
    import numpy as np

    def f(x):
        return _u8_normalize(x) if x.dtype == np.uint8 else x

    return jax.tree_util.tree_map(f, batch)


def prefetch_to_device(
    it: Iterator[Any],
    mesh: Optional[Mesh] = None,
    depth: int = 2,
    leading_stack_dims: int = 0,
    spatial_axis=None,
) -> Iterator[Any]:
    """Yield device-resident batches with ``depth`` transfers in flight.

    With a mesh, batches are laid out batch-sharded over the 'data' axis; the
    stack dim (fused-step microbatches) replicates. uint8 image leaves are
    normalized to float32 [-1,1] ON DEVICE after the transfer (see
    ``_normalize_u8_leaves``) so consumers always see the DataSource float
    convention regardless of wire dtype.
    """
    queue = collections.deque()

    def put(batch):
        if mesh is not None:
            d = shard_batch(batch, mesh, leading_stack_dims=leading_stack_dims,
                            spatial_axis=spatial_axis)
        else:
            d = jax.device_put(batch)
        return _normalize_u8_leaves(d)

    for batch in it:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()

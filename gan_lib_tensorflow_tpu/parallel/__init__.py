"""Parallelism over the TPU device mesh.

The reference has **no** distributed backend (SURVEY.md §2.3): at most
in-graph multi-GPU tower averaging in its lineage. The TPU-native replacement
is ``jax.sharding``: a named ``Mesh`` over ICI, NamedSharding annotations on
batch/params, and XLA-inserted collectives (psum for DP gradient reduction,
all_gather for eval pooling). There is deliberately no hand-written comm
layer — the backend is XLA/PJRT.

Axes:
  'data'  — batch sharding (DP). The primary scaling axis for every model.
  'model' — optional tensor-parallel axis: wide conv kernels shard their
            output-channel dim; XLA GSPMD propagates activation shardings and
            inserts the reduce-scatter/all-gather pattern.
Pipeline/expert parallelism are N/A for this model zoo (no layer pipelining
need at these sizes, no MoE) — documented, not omitted.
"""

from .mesh import create_mesh, local_device_count
from .sharding import (
    batch_sharding,
    replicate,
    shard_batch,
    tensor_parallel_spec,
    train_state_shardings,
)
from .prefetch import prefetch_to_device

__all__ = [
    "create_mesh", "local_device_count",
    "batch_sharding", "replicate", "shard_batch", "tensor_parallel_spec",
    "train_state_shardings",
    "prefetch_to_device",
]

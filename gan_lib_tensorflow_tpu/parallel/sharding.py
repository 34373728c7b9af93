"""Sharding rules: batch DP specs and tensor-parallel param partitioning."""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, batch_axis: str = "data") -> NamedSharding:
    """NamedSharding that shards leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(batch_axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, batch_axis: str = "data",
                leading_stack_dims: int = 0,
                spatial_axis: Optional[str] = None) -> Any:
    """Device-put a host batch pytree with the batch dim sharded over 'data'.

    ``leading_stack_dims``: number of leading microbatch-stack dims before the
    batch dim (the fused n_critic step takes [n_micro, B, ...] stacks — the
    stack dim is replicated, B shards).

    ``spatial_axis``: additionally shard the image HEIGHT dim of NHWC image
    leaves over this mesh axis — GSPMD spatial partitioning. XLA inserts the
    halo exchanges that 3x3/5x5 convs need at shard edges (the conv-world
    analog of sequence/context parallelism; used by PGGAN at high resolution
    where the per-chip batch is too small for pure DP — SURVEY.md §2.3).
    """
    def put(x):
        dims = [None] * leading_stack_dims + [batch_axis]
        if spatial_axis is not None and x.ndim >= leading_stack_dims + 4:
            dims.append(spatial_axis)
        spec = P(*dims)
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def tensor_parallel_spec(
    params: Any,
    mesh: Mesh,
    model_axis: str = "model",
    min_features: int = 256,
) -> Any:
    """Assign PartitionSpecs to a param pytree for GSPMD tensor parallelism.

    Wide kernels shard their output-channel (last) dim over the model axis;
    everything else replicates. XLA propagates matching activation shardings
    and inserts the collectives — the GSPMD analog of Megatron column
    parallelism, applied where channel counts are large enough to matter
    (SNGAN-projection 1024-ch blocks, PGGAN low-res 512-ch blocks).

    Returns a pytree of NamedSharding matching ``params``' structure.
    """
    model_size = mesh.shape[model_axis] if model_axis in mesh.axis_names else 1

    def spec_for(path, leaf):
        if model_size > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            out_dim = leaf.shape[-1]
            if out_dim >= min_features and out_dim % model_size == 0:
                return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + [model_axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)

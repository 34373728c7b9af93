"""bench.py multi-device layout correctness (VERDICT r1 missing #4).

The headline bench must be honest on a real multi-chip slice: the batch dim
is global and sharded over the 'data' mesh axis, so per-chip throughput =
total/N. These tests pin the layout without executing the fused step (XLA-CPU
compile of the 5-critic step takes >10 min — layout is what regressed-able).
"""

import os
import sys

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from gan_lib_tensorflow_tpu.parallel import create_mesh  # noqa: E402


def test_bench_batch_shards_over_data_axis():
    mesh = create_mesh()  # 8 virtual CPU devices, 1-D ('data',)
    assert mesh.shape["data"] == 8
    spec, state, step, device = bench.build_step(np.float32, mesh=mesh)
    batch = bench.make_bench_batch(spec, global_batch=16, mesh=mesh)
    for leaf in jax.tree_util.tree_leaves(batch):
        assert leaf.shape[0] == spec.n_micro
        assert leaf.shape[1] == 16
        hlo_spec = leaf.sharding.spec
        # microbatch-stack dim replicated, batch dim over 'data'
        assert tuple(hlo_spec) == (None, "data"), hlo_spec
        # each device holds a [n_micro, 2, ...] shard
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[1] == 2


def test_bench_batch_single_device_path():
    spec, _, _, _ = bench.build_step(np.float32)
    batch = bench.make_bench_batch(spec, global_batch=4)
    for leaf in jax.tree_util.tree_leaves(batch):
        assert leaf.shape[:2] == (spec.n_micro, 4)

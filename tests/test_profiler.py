"""utils.profiler: StepTimer accounting and the maybe_trace flag gate
(SURVEY §5 tracing row — the timing discipline every bench script relies on)."""

import os

import jax.numpy as jnp

from gan_lib_tensorflow_tpu.utils import profiler


def test_step_timer_accounting():
    t = profiler.StepTimer(images_per_step=64, n_chips=2)
    x = jnp.ones((4,))
    t.start(sync_on=x)
    t.tick()
    t.tick(3)
    out = t.stop(sync_on=x)
    assert out["steps"] == 4
    assert out["seconds"] > 0
    assert abs(out["sec_per_step"] * 4 - out["seconds"]) < 1e-9
    assert abs(out["images_per_sec"] - 4 * 64 / out["seconds"]) < 1e-6
    assert abs(out["images_per_sec_per_chip"] * 2 - out["images_per_sec"]) < 1e-6


def test_maybe_trace_writes_and_noops(tmp_path):
    with profiler.maybe_trace(None):  # flag off: pure no-op
        _ = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    trace_dir = str(tmp_path / "trace")
    with profiler.maybe_trace(trace_dir):
        _ = (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # jax writes plugins/profile/<ts>/*.xplane.pb under the trace dir
    found = [f for _, _, fs in os.walk(trace_dir) for f in fs]
    assert any(f.endswith(".xplane.pb") for f in found), found


def test_hard_sync_handles_empty_tree():
    profiler.hard_sync({})  # no leaves: must not raise
    profiler.hard_sync(jnp.arange(3))

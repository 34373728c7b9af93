"""Device-resident packed store + uint8 wire mode (round-4 transfer law).

The host->device link is the measured input bottleneck on tunneled hosts
(docs/PERF.md); these tests pin the two mitigations: DeviceCachedStore
(dataset in HBM, steps ship indices) and wire_dtype="uint8" streaming with
on-device normalize. Both must be value-identical to the original host path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gan_lib_tensorflow_tpu import data
from gan_lib_tensorflow_tpu.data import native
from gan_lib_tensorflow_tpu.data.packed import finalize_store, write_store
from gan_lib_tensorflow_tpu.parallel import create_mesh, prefetch_to_device


def _make_store(tmp_path, n=40, size=16, labeled=True):
    out = str(tmp_path / "store")
    rng = np.random.default_rng(7)
    images, labels = write_store(
        out, n, size, size, 3,
        classes=[str(c) for c in range(4)] if labeled else None)
    images[:] = rng.integers(0, 256, (n, size, size, 3), np.uint8)
    if labeled:
        labels[:] = rng.integers(0, 4, n).astype(np.int32)
    finalize_store(out, images, labels)
    return out


def test_device_cache_matches_host_gather(tmp_path):
    path = _make_store(tmp_path)
    cache = data.DeviceCachedStore(path, batch_size=4, n_micro=3, seed=0)
    host = data.PackedImageStore(path, batch_size=4, seed=0)

    idx = cache.indices_for(5)
    got = cache._gather(cache._images, cache._labels, idx)
    want_img = native.gather_normalize(host.images, idx.reshape(-1))
    np.testing.assert_array_equal(
        np.asarray(got["image"]).reshape(-1, 16, 16, 3), want_img)
    np.testing.assert_array_equal(
        np.asarray(got["label"]).reshape(-1), host.labels[idx.reshape(-1)])


def test_device_cache_stream_is_counter_based(tmp_path):
    path = _make_store(tmp_path)
    a = data.DeviceCachedStore(path, batch_size=4, n_micro=2, seed=3)
    batches = [next(iter(a)) for _ in range(5)]

    b = data.DeviceCachedStore(path, batch_size=4, n_micro=2, seed=3)
    b.set_stream_position(3)  # resume mid-stream
    resumed = next(iter(b))
    np.testing.assert_array_equal(np.asarray(batches[3]["image"]),
                                  np.asarray(resumed["image"]))
    np.testing.assert_array_equal(np.asarray(batches[3]["label"]),
                                  np.asarray(resumed["label"]))
    # a fresh iter() on a continues the stream, not replays batch 0
    cont = next(iter(a))
    for prev in batches:
        assert not np.array_equal(np.asarray(cont["image"]),
                                  np.asarray(prev["image"]))


def test_device_cache_epoch_has_no_repeats(tmp_path):
    path = _make_store(tmp_path, n=40)
    c = data.DeviceCachedStore(path, batch_size=4, n_micro=2, seed=0)
    per_epoch = 40 // 8
    seen = np.concatenate([c.indices_for(p).reshape(-1)
                           for p in range(per_epoch)])
    assert len(np.unique(seen)) == len(seen)
    # next epoch reshuffles
    assert not np.array_equal(c.indices_for(0), c.indices_for(per_epoch))


def test_device_cache_validates_sizes(tmp_path):
    path = _make_store(tmp_path, n=8)
    with pytest.raises(ValueError, match="fused-step stack"):
        data.DeviceCachedStore(path, batch_size=4, n_micro=3)
    with pytest.raises(ValueError, match="device-cache budget"):
        data.DeviceCachedStore(path, batch_size=4, n_micro=1, max_bytes=100)


def test_packed_training_source_policies(tmp_path):
    path = _make_store(tmp_path)
    src = data.packed_training_source(path, batch_size=4, n_micro=2)
    assert isinstance(src, data.DeviceCachedStore)

    streamed = data.packed_training_source(path, batch_size=4, n_micro=2,
                                           policy="auto", budget_bytes=100)
    assert isinstance(streamed, data.ThreadedSource)
    with pytest.raises(ValueError, match="device-cache budget"):
        data.packed_training_source(path, batch_size=4, n_micro=2,
                                    policy="on", budget_bytes=100)
    off = data.packed_training_source(path, batch_size=4, n_micro=2,
                                      policy="off")
    assert isinstance(off, data.ThreadedSource)


def test_uint8_wire_matches_float_wire(tmp_path):
    path = _make_store(tmp_path)
    f32 = data.PackedImageStore(path, batch_size=4, seed=5)
    u8 = data.PackedImageStore(path, batch_size=4, seed=5,
                               wire_dtype="uint8")
    raw = next(iter(u8))
    assert raw["image"].dtype == np.uint8

    dev = next(prefetch_to_device(iter(u8.reseeded(5)), None, depth=1))
    assert dev["image"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dev["image"]),
                                  next(iter(f32))["image"])
    assert dev["label"].dtype == jnp.int32


def test_device_cache_under_mesh(tmp_path):
    path = _make_store(tmp_path, n=64)
    mesh = create_mesh((8,), ("data",))
    c = data.DeviceCachedStore(path, batch_size=8, n_micro=2, seed=1,
                               mesh=mesh)
    b = next(iter(c))
    assert b["image"].shape == (2, 8, 16, 16, 3)
    # batch dim sharded over 'data', store replicated
    assert b["image"].sharding.spec[1] == "data"
    plain = data.DeviceCachedStore(path, batch_size=8, n_micro=2, seed=1)
    np.testing.assert_array_equal(np.asarray(b["image"]),
                                  np.asarray(next(iter(plain))["image"]))


def test_train_loop_consumes_device_cache(tmp_path):
    """End-to-end: the loop's yields_stacks path + resume priming."""
    import optax
    from gan_lib_tensorflow_tpu.models import sngan
    from gan_lib_tensorflow_tpu.train import (
        CheckpointManager, LoopConfig, create_state, jit_train_step,
        train_loop)

    path = _make_store(tmp_path, n=64, size=8)
    g = sngan.ResNetGenerator(channels=(8,), bottom_ch=8, z_dim=4)
    d = sngan.ResNetDiscriminator(channels=(8, 8), downsample=(True, False))
    spec = sngan.make_sngan_spec(g, d, n_critic=2)
    gopt, dopt = optax.adam(1e-4), optax.adam(1e-4)
    state = create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, 4)), train=False),
        lambda r: d.init(r, jnp.zeros((2, 8, 8, 3))),
        gopt, dopt)
    step_fn = jit_train_step(spec, gopt, dopt)
    src = data.DeviceCachedStore(path, batch_size=4, n_micro=spec.n_micro,
                                 seed=0)
    cfg = LoopConfig(total_steps=3, log_every=1, sample_every=10**9,
                     checkpoint_every=10**9, out_dir=str(tmp_path / "run"))
    out = train_loop(state, step_fn, src, spec.n_micro, cfg)
    assert int(out.step) == 3
    assert src._pos == 3


# ---------------------------------------------------------------- paired


def _make_paired_store(tmp_path, n=6, scale=36):
    """Combined A|B rows with B = 255 - A (crop consistency checkable)."""
    import json as json_mod
    out = tmp_path / "paired"
    out.mkdir()
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 256, (n, scale, 2 * scale, 3), np.uint8)
    rows[..., scale:, :] = 255 - rows[..., :scale, :]
    mm = np.memmap(out / "images.u8", np.uint8, "w+", shape=rows.shape)
    mm[:] = rows
    mm.flush()
    (out / "meta.json").write_text(json_mod.dumps(
        {"n": n, "height": scale, "width": 2 * scale, "channels": 3,
         "num_classes": 0, "classes": None, "paired": True,
         "format": "ganpack-v1"}))
    return str(out), rows


def test_paired_device_cache_matches_host_jitter(tmp_path):
    path, rows = _make_paired_store(tmp_path)
    c = 32
    cache = data.DeviceCachedPairedStore(path, batch_size=2, image_size=c,
                                         n_micro=2, seed=0)
    idx, oy, ox, fl = cache.controls_for(4)
    got = cache._gather(cache._rows, idx, oy, ox, fl)
    assert got["input"].shape == (2, 2, c, c, 3)

    # host oracle: native crop+flip+normalize with the SAME controls
    flat_in = np.asarray(got["input"]).reshape(-1, c, c, 3)
    flat_tg = np.asarray(got["target"]).reshape(-1, c, c, 3)
    for k in range(len(idx)):
        row = rows[idx[k]]
        want_in = native.crop_flip_normalize(row, int(oy[k]), 0 + int(ox[k]),
                                             c, bool(fl[k]))
        want_tg = native.crop_flip_normalize(row, int(oy[k]),
                                             36 + int(ox[k]), c, bool(fl[k]))
        np.testing.assert_array_equal(flat_in[k], want_in)
        np.testing.assert_array_equal(flat_tg[k], want_tg)
    # pairing invariant of the fixture survives the shared jitter
    np.testing.assert_allclose(flat_in + flat_tg,
                               np.zeros_like(flat_in) + (255 / 127.5 - 2),
                               atol=1e-5)


def test_paired_device_cache_stream_and_policy(tmp_path):
    path, _ = _make_paired_store(tmp_path)
    a = data.DeviceCachedPairedStore(path, batch_size=2, image_size=32,
                                     n_micro=1, seed=1)
    b0, b1 = next(iter(a)), next(iter(a))
    assert not np.array_equal(np.asarray(b0["input"]),
                              np.asarray(b1["input"]))
    b = data.DeviceCachedPairedStore(path, batch_size=2, image_size=32,
                                     n_micro=1, seed=1)
    b.set_stream_position(1)
    np.testing.assert_array_equal(np.asarray(next(iter(b))["input"]),
                                  np.asarray(b1["input"]))

    src = data.packed_paired_training_source(path, batch_size=2,
                                             image_size=32)
    assert isinstance(src, data.DeviceCachedPairedStore)
    streamed = data.packed_paired_training_source(path, batch_size=2,
                                                  image_size=32,
                                                  budget_bytes=10)
    assert isinstance(streamed, data.ThreadedSource)


def test_sequential_batches_reuses_resident_store(tmp_path):
    """Eval real-moment pass reads the RESIDENT buffer (no second upload):
    values match the host store in order, the training stream position is
    untouched, and over-reads fail loudly (ADVICE r4 train_sngan dup fix)."""
    path = _make_store(tmp_path)
    cache = data.DeviceCachedStore(path, batch_size=4, n_micro=2, seed=0)
    host = data.PackedImageStore(path, batch_size=4, seed=0)

    cache.set_stream_position(7)
    got = list(cache.sequential_batches(8, 3))
    assert cache._pos == 7  # eval pass must not advance the train stream
    flat = np.concatenate([np.asarray(b) for b in got])
    want = native.gather_normalize(host.images, np.arange(24))
    np.testing.assert_array_equal(flat, want)
    with pytest.raises(ValueError, match="holds"):
        list(cache.sequential_batches(8, 100))


def test_epoch_permutation_memoized(tmp_path):
    """The per-epoch shuffle is generated once per epoch, not per step
    (ADVICE r4: O(n) host work every step), and stays a pure function of
    (seed, epoch)."""
    from gan_lib_tensorflow_tpu.data import device_cache as dc

    path = _make_store(tmp_path)
    cache = data.DeviceCachedStore(path, batch_size=4, n_micro=2, seed=5)
    i0 = cache.indices_for(0)
    order_obj = cache._perm_cache[1]
    cache.indices_for(1)
    assert cache._perm_cache[1] is order_obj  # same epoch -> no regeneration
    # epoch rollover regenerates; seeking BACK to epoch 0 reproduces step 0
    cache.indices_for(cache._steps_per_epoch)
    assert cache._perm_cache[0] == 1
    np.testing.assert_array_equal(cache.indices_for(0), i0)

"""Mesh-aware, resume-deterministic device-synthetic sources
(VERDICT r2 items #4 and #8)."""

import jax
import numpy as np

from gan_lib_tensorflow_tpu import data
from gan_lib_tensorflow_tpu.parallel import create_mesh


def _get(b):
    return {k: np.asarray(jax.device_get(v)) for k, v in b.items()}


def test_device_fake_mesh_sharded_and_stream_equal():
    """With a mesh: batches are device-resident and 'data'-sharded, and the
    stream VALUES are identical to the single-device stream (partitionable
    threefry)."""
    mesh = create_mesh()
    kw = dict(batch_size=16, image_size=8, num_classes=4, seed=3, n_micro=2)
    plain = data.DeviceFakeImages(**kw)
    sharded = data.DeviceFakeImages(**kw, mesh=mesh)

    it_p, it_s = iter(plain), iter(sharded)
    for _ in range(2):
        bp, bs = _get(next(it_p)), next(it_s)
        sh = bs["image"].sharding
        assert "data" in sh.spec  # batch dim sharded over the mesh
        assert bs["image"].shape == (2, 16, 8, 8, 3)
        np.testing.assert_allclose(np.asarray(bs["image"]), bp["image"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bs["label"]), bp["label"])


def test_device_fake_spatial_axis_shards_height():
    mesh = create_mesh((4, 2), ("data", "sp"))
    src = data.DeviceFakeImages(batch_size=4, image_size=16, num_classes=1,
                                seed=0, mesh=mesh, spatial_axis="sp")
    b = next(iter(src))
    assert b["image"].sharding.spec == (None, "data", "sp", None, None)


def test_device_sources_resume_determinism():
    """set_stream_position(k) reproduces exactly the batch an uninterrupted
    run would see at position k — and it differs from batch 0."""
    for cls, kw in [
        (data.DeviceFakeImages, dict(batch_size=4, image_size=8, seed=5)),
        (data.DeviceFakePairedImages, dict(batch_size=2, image_size=16, seed=5)),
    ]:
        a = cls(**kw)
        it = iter(a)
        batches = [_get(next(it)) for _ in range(5)]

        b = cls(**kw)
        b.set_stream_position(3)
        resumed = _get(next(iter(b)))
        for k in resumed:
            np.testing.assert_array_equal(resumed[k], batches[3][k])
            assert not np.array_equal(resumed[k], batches[0][k])


def test_train_loop_primes_device_stream(tmp_path):
    """A crash-resumed loop must NOT replay the device stream from batch 0:
    after resume at step N the source is primed to position N (the loop calls
    set_stream_position), so the resumed run consumes exactly the batches the
    uninterrupted run would have."""

    class Recorder:
        yields_stacks = True
        batch_size = 2

        def __init__(self):
            self.src = data.DeviceFakeImages(batch_size=2, image_size=8, seed=9)
            self.positions = []

        def set_stream_position(self, pos):
            self.src.set_stream_position(pos)

        def __iter__(self):
            it = iter(self.src)
            while True:
                self.positions.append(self.src._pos)
                yield next(it)

    import optax
    from gan_lib_tensorflow_tpu.models import sngan
    from gan_lib_tensorflow_tpu.train import (LoopConfig, create_state,
                                              jit_train_step, train_loop)
    import jax.numpy as jnp

    g = sngan.ResNetGenerator(channels=(8,), bottom_ch=8, z_dim=8, bottom=4)
    d = sngan.ResNetDiscriminator(channels=(8, 8), downsample=(True, False))
    spec = sngan.make_sngan_spec(g, d, n_critic=1, ema_decay=0)
    opt = optax.adam(1e-4)
    state = create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, 8)), train=False),
        lambda r: d.init(r, jnp.zeros((2, 8, 8, 3))),
        opt, opt)
    step_fn = jit_train_step(spec, opt, opt)

    rec = Recorder()
    cfg = LoopConfig(total_steps=3, log_every=10, sample_every=100,
                     checkpoint_every=100, out_dir=str(tmp_path))
    state = train_loop(state, step_fn, rec, 1, cfg)
    assert rec.positions[:3] == [0, 1, 2]

    # "resume" at step 3: a fresh loop over the same (already-walked) source
    # must re-prime to 3, not continue from wherever the instance happened
    # to be, and not restart at 0
    rec.src.set_stream_position(999)  # garbage position; loop must fix it
    state = train_loop(state.replace(step=jnp.int32(3)), step_fn, rec, 1,
                       dataclasses_replace(cfg, total_steps=5))
    assert rec.positions[-2:] == [3, 4]


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)

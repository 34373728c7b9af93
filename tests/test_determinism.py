"""Reproducibility: two independent runs from the same seed produce identical
metrics and parameters (the fixed-seed loss-curve story, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_lib_tensorflow_tpu import data, train
from gan_lib_tensorflow_tpu.models import sngan


def _run(seed, n_steps):
    g = sngan.ResNetGenerator(channels=(8,), bottom_ch=8, z_dim=4)
    d = sngan.ResNetDiscriminator(channels=(8, 8), downsample=(True, False))
    spec = sngan.make_sngan_spec(g, d, n_critic=2, ema_decay=0.999)
    g_optim = optax.adam(1e-3)
    d_optim = optax.adam(1e-3)
    state = train.create_state(
        jax.random.PRNGKey(seed),
        lambda r: g.init(r, jnp.zeros((2, 4)), train=False),
        lambda r: d.init(r, jnp.zeros((2, 8, 8, 3))),
        g_optim, d_optim, ema_decay=0.999)
    step = train.jit_train_step(spec, g_optim, d_optim)
    src = data.FakeImages(batch_size=4, image_size=8, seed=seed)
    it = data.microbatch_stack(src, spec.n_micro)
    traj = []
    for _ in range(n_steps):
        state, m = step(state, next(it))
        traj.append({k: float(v) for k, v in m.items()})
    return traj, state


def test_same_seed_bitwise_reproducible():
    t1, s1 = _run(7, 3)
    t2, s2 = _run(7, 3)
    assert t1 == t2  # exact float equality across runs
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_seed_differs():
    t1, _ = _run(7, 2)
    t3, _ = _run(8, 2)
    assert t1 != t3

"""GSPMD spatial partitioning (SP analog) tests on the 8-virtual-device mesh:
a spatially-sharded PGGAN WGAN-GP step runs, and sharded conv output matches
the unsharded computation (halo exchange correctness)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gan_lib_tensorflow_tpu import ops, train
from gan_lib_tensorflow_tpu.models import pggan
from gan_lib_tensorflow_tpu.parallel import create_mesh, shard_batch


def test_spatially_sharded_conv_matches_unsharded():
    mesh = create_mesh((2, 4), ("data", "sp"))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 32, 32, 8))
    conv = ops.Conv(16, 3)
    variables = conv.init(jax.random.PRNGKey(1), x)

    y_ref = conv.apply(variables, x)

    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
    v_sh = jax.device_put(variables, NamedSharding(mesh, P()))
    y_sh = jax.jit(conv.apply)(v_sh, x_sh)
    # XLA must have halo-exchanged the 1-row borders across 'sp' shards
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_pggan_step_dp_sp():
    mesh = create_mesh((4, 2), ("data", "sp"))
    res = 16
    g = pggan.PGGANGenerator(resolution=res, fade_in=True, z_dim=8, width_mul=1 / 64)
    d = pggan.PGGANDiscriminator(resolution=res, fade_in=True, width_mul=1 / 64,
                                 mbstd_group_size=2)
    spec = pggan.make_pggan_spec(g, d, ema_decay=0.999)
    g_optim = optax.adam(1e-3)
    d_optim = optax.adam(1e-3)
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, 8)), 1.0),
        lambda r: d.init(r, jnp.zeros((4, res, res, 3)), 1.0),
        g_optim, d_optim, ema_decay=0.999)
    state = state.replace(alpha=jnp.float32(0.3))
    state = jax.device_put(state, NamedSharding(mesh, P()))

    rng = np.random.default_rng(0)
    batch = {"image": rng.standard_normal((1, 8, res, res, 3)).astype(np.float32)}
    batch = shard_batch(batch, mesh, leading_stack_dims=1, spatial_axis="sp")
    assert len(batch["image"].sharding.device_set) == 8

    step = jax.jit(train.make_train_step(spec, g_optim, d_optim), donate_argnums=0)
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1


def test_pggan_step_dp_sp_s2d_matches_composed():
    """The CLI default (--s2d-from 512) combines the space-to-depth top level
    with SP height sharding on real high-res runs; on the virtual mesh,
    assert the sharded S2D step computes the same metrics as the sharded
    composed step from identical state/batch (the S2D reshape must survive
    GSPMD's height partitioning)."""
    mesh = create_mesh((4, 2), ("data", "sp"))
    res = 16

    def run(s2d_from):
        g = pggan.PGGANGenerator(resolution=res, z_dim=8, width_mul=1 / 64,
                                 s2d_from=s2d_from)
        d = pggan.PGGANDiscriminator(resolution=res, width_mul=1 / 64,
                                     mbstd_group_size=2,
                                     fused_from=0 if s2d_from else res,
                                     s2d_from=s2d_from)
        spec = pggan.make_pggan_spec(g, d, ema_decay=0.999)
        g_optim = optax.adam(1e-3)
        d_optim = optax.adam(1e-3)
        state = train.create_state(
            jax.random.PRNGKey(0),
            lambda r: g.init(r, jnp.zeros((2, 8)), 1.0),
            lambda r: d.init(r, jnp.zeros((4, res, res, 3)), 1.0),
            g_optim, d_optim, ema_decay=0.999)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        rng = np.random.default_rng(0)
        batch = {"image": rng.standard_normal((1, 8, res, res, 3)).astype(np.float32)}
        batch = shard_batch(batch, mesh, leading_stack_dims=1, spatial_axis="sp")
        step = jax.jit(train.make_train_step(spec, g_optim, d_optim),
                       donate_argnums=0)
        _, metrics = step(state, batch)
        return {k: float(v) for k, v in metrics.items()}

    # fused_from=res on the composed side: s2d implies the fused_scale
    # nonlinearity ordering, so that's the matching composed function.
    m_composed = run(0)
    m_s2d = run(res)
    for k in m_composed:
        np.testing.assert_allclose(m_s2d[k], m_composed[k], rtol=2e-4,
                                   atol=2e-4, err_msg=k)

"""Rematerialization: identical outputs/params with remat on/off (memory knob
for 1024^2 PGGAN), including through the WGAN-GP double-backward."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu import losses
from gan_lib_tensorflow_tpu.models import pggan


def test_remat_parity_forward_and_gp_grad():
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))

    g0 = pggan.PGGANGenerator(resolution=16, z_dim=16, width_mul=1 / 32)
    g1 = pggan.PGGANGenerator(resolution=16, z_dim=16, width_mul=1 / 32, remat_from=8)
    v = g0.init(jax.random.PRNGKey(2), z, 1.0)
    # identical param structure: remat variant runs with the same variables
    y0 = g0.apply(v, z, 1.0)
    y1 = g1.apply(v, z, 1.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-6)

    d0 = pggan.PGGANDiscriminator(resolution=16, width_mul=1 / 32,
                                  mbstd_group_size=2)
    d1 = pggan.PGGANDiscriminator(resolution=16, width_mul=1 / 32,
                                  mbstd_group_size=2, remat_from=8)
    dv = d0.init(jax.random.PRNGKey(3), x, 1.0)

    def gp(model):
        def f(params):
            critic = lambda xx: model.apply({"params": params}, xx, 1.0)
            return losses.gradient_penalty(critic, x, jnp.tanh(y0),
                                           jax.random.PRNGKey(4))
        return jax.grad(f)(dv["params"])

    ga = gp(d0)
    gb = gp(d1)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

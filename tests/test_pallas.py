"""Pallas kernel correctness (runs in interpreter mode on the CPU suite;
compiled-mode verified on TPU — see module docstring for A/B timings)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu.ops.pallas_kernels import (
    batched_power_iteration,
    fadein_blend,
    pack_weights,
)
from gan_lib_tensorflow_tpu.ops.sn import power_iteration


def test_batched_power_iteration_matches_reference():
    rng = np.random.default_rng(0)
    shapes = [(1152, 128), (27, 64), (128, 1), (9, 256)]
    mats = [rng.standard_normal(s) for s in shapes]
    us = [rng.standard_normal((1, s[1])) for s in shapes]
    w_stack, u_stack = pack_weights(mats, us)
    sig, u_new = batched_power_iteration(w_stack, u_stack)
    for i, (m, u) in enumerate(zip(mats, us)):
        s_ref, u_ref = power_iteration(
            jnp.asarray(m, jnp.float32), jnp.asarray(u, jnp.float32), 1)
        np.testing.assert_allclose(float(sig[i]), float(s_ref), rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(u_new[i, 0, : u.shape[-1]]), np.asarray(u_ref[0]),
            rtol=1e-4, atol=1e-5)
        # padded lanes stay ~zero
        if u_new.shape[-1] > u.shape[-1]:
            assert float(np.abs(np.asarray(u_new[i, 0, u.shape[-1]:])).max()) < 1e-5


def test_fadein_blend_matches_lerp():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((3, 17, 9, 4)).astype(np.float32)
    b = rng.standard_normal((3, 17, 9, 4)).astype(np.float32)
    for alpha in (0.0, 0.37, 1.0):
        out = fadein_blend(jnp.asarray(a), jnp.asarray(b), alpha)
        np.testing.assert_allclose(np.asarray(out), alpha * a + (1 - alpha) * b,
                                   rtol=1e-5, atol=1e-6)

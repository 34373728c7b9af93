"""Fused upsample-conv: exactness vs the composed form, param compatibility,
and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu import ops
from gan_lib_tensorflow_tpu.ops.fused import upsample2x_conv
from gan_lib_tensorflow_tpu.ops.layers import UpsampleConv


def test_fused_matches_composed_3x3_and_1x1():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 9, 7, 5))  # odd dims too
    for k in (3, 1):
        w = jax.random.normal(jax.random.PRNGKey(k), (k, k, 5, 6))
        ref = jax.lax.conv_general_dilated(
            ops.upsample_nearest(x), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = upsample2x_conv(x, w)
        assert got.shape == ref.shape == (2, 18, 14, 6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_module_fused_flag_parity_and_param_compat():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 4))
    fused = UpsampleConv(6, 3, fused=True)
    plain = UpsampleConv(6, 3, fused=False)
    variables = fused.init(jax.random.PRNGKey(1), x)
    # identical param structure: same variables drive both paths
    y_f = fused.apply(variables, x)
    y_p = plain.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_p),
                               rtol=1e-5, atol=1e-5)
    assert variables["params"]["kernel"].shape == (3, 3, 4, 6)


def test_fused_gradients_match():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 6, 6, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 2))

    def loss_fused(w):
        return jnp.sum(jnp.square(upsample2x_conv(x, w)))

    def loss_ref(w):
        y = jax.lax.conv_general_dilated(
            ops.upsample_nearest(x), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.square(y))

    gf = jax.grad(loss_fused)(w)
    gr = jax.grad(loss_ref)(w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)

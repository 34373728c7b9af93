"""Unit tests for the shared ops library (layers, resize helpers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_lib_tensorflow_tpu import ops


def test_dense_shapes_and_init_scale():
    key = jax.random.PRNGKey(0)
    m = ops.Dense(64)
    params = m.init(key, jnp.zeros((4, 128)))
    y = m.apply(params, jnp.ones((4, 128)))
    assert y.shape == (4, 64)
    k = params["params"]["kernel"]
    # He-normal: std ~ sqrt(2/128)
    assert abs(float(k.std()) - np.sqrt(2 / 128)) < 0.02


def test_conv_same_padding_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 32, 32, 3))
    y = ops.Conv(16, 3).init_with_output(key, x)[0]
    assert y.shape == (2, 32, 32, 16)
    y = ops.Conv(16, 3, strides=2).init_with_output(key, x)[0]
    assert y.shape == (2, 16, 16, 16)
    # odd input, TF-SAME: ceil(33/2) = 17
    y = ops.Conv(16, 4, strides=2).init_with_output(key, jnp.zeros((2, 33, 33, 3)))[0]
    assert y.shape == (2, 17, 17, 16)


def test_conv_transpose_doubles_resolution():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 4))
    y = ops.ConvTranspose(8, 5, strides=2).init_with_output(key, x)[0]
    assert y.shape == (2, 16, 16, 8)
    y = ops.ConvTranspose(8, 4, strides=2).init_with_output(key, x)[0]
    assert y.shape == (2, 16, 16, 8)


def test_upsample_nearest_values():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = ops.upsample_nearest(x)
    assert y.shape == (1, 4, 4, 1)
    expected = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], expected)


def test_downsample_avg_values():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = ops.downsample_avg(x)
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_global_sum_pool():
    x = jnp.ones((3, 4, 4, 7))
    y = ops.global_sum_pool(x)
    assert y.shape == (3, 7)
    np.testing.assert_allclose(np.asarray(y), 16.0)


def test_equalized_lr_runtime_scale():
    """Equalized layers init from N(0,1) and scale by sqrt(2/fan_in) at runtime:
    output variance must match a He-initialized layer's despite unit-normal params."""
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (512, 256))
    m = ops.Dense(128, equalized=True, use_bias=False)
    params = m.init(key, x)
    k = params["params"]["kernel"]
    assert abs(float(k.std()) - 1.0) < 0.02  # params are unit-normal
    y = m.apply(params, x)
    # y ~ N(0, 2) per He scaling with unit-normal input
    assert abs(float(y.std()) - np.sqrt(2.0)) < 0.1


def test_embedding_lookup():
    key = jax.random.PRNGKey(0)
    m = ops.Embedding(10, 16)
    params = m.init(key, jnp.zeros((4,), jnp.int32))
    y = m.apply(params, jnp.array([1, 1, 3, 9]))
    assert y.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[1]))


def test_compute_dtype_bf16_keeps_params_fp32():
    key = jax.random.PRNGKey(0)
    m = ops.Conv(8, 3, compute_dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 3), jnp.bfloat16)
    params = m.init(key, x)
    assert params["params"]["kernel"].dtype == jnp.float32
    y = m.apply(params, x)
    assert y.dtype == jnp.bfloat16


@pytest.mark.parametrize("block_cls,kw", [
    (ops.GenResBlock, dict(features=32, upsample=True)),
    (ops.DiscResBlock, dict(features=32, downsample=True)),
    (ops.DiscOptimizedBlock, dict(features=32)),
])
def test_resblocks_shapes(block_cls, kw):
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 8, 8, 16))
    m = block_cls(**kw)
    if block_cls is ops.GenResBlock:
        y, _ = m.init_with_output(key, x, train=False)
        assert y.shape == (2, 16, 16, 32)
    else:
        y, _ = m.init_with_output(key, x)
        assert y.shape == (2, 4, 4, 32)


def test_dense_weight_norm_identity_at_init():
    """tflib weightnorm=True: g init = column norms => identity at step 0."""
    import jax
    import jax.numpy as jnp
    from gan_lib_tensorflow_tpu.ops import Dense

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    d_wn = Dense(8, weight_norm=True)
    d_plain = Dense(8)
    v_wn = d_wn.init(jax.random.PRNGKey(0), x)
    v_plain = d_plain.init(jax.random.PRNGKey(0), x)
    assert "wn_g" in v_wn["params"]
    np.testing.assert_allclose(np.asarray(d_wn.apply(v_wn, x)),
                               np.asarray(d_plain.apply(v_plain, x)),
                               rtol=1e-6, atol=1e-6)
    # scaling g scales each output column linearly
    v2 = jax.tree_util.tree_map(lambda a: a, v_wn)
    v2 = {"params": dict(v_wn["params"])}
    v2["params"]["wn_g"] = v_wn["params"]["wn_g"] * 2.0
    y2 = d_wn.apply(v2, x)
    bias = v_wn["params"]["bias"]
    np.testing.assert_allclose(
        np.asarray(y2 - bias), 2.0 * np.asarray(d_wn.apply(v_wn, x) - bias),
        rtol=1e-5, atol=1e-6)


def test_init_string_vocabulary():
    import jax
    import jax.numpy as jnp
    import pytest
    from gan_lib_tensorflow_tpu.ops import Conv, Dense
    from gan_lib_tensorflow_tpu.ops import initializers

    x = jnp.ones((2, 4))
    for name in ("he", "glorot", "he_normal"):
        Dense(8, kernel_init=name).init(jax.random.PRNGKey(0), x)
    Conv(8, 3, kernel_init="glorot").init(jax.random.PRNGKey(0),
                                          jnp.ones((1, 8, 8, 3)))
    with pytest.raises(ValueError, match="unknown initializer"):
        initializers.get("bogus")

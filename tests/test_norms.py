"""Norm-layer tests: BN stats, conditional BN label selection, LN, PixelNorm,
minibatch-stddev channel (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu import ops


def test_batchnorm_normalizes_and_tracks_stats():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 4, 4, 8)) * 3.0 + 5.0
    m = ops.BatchNorm(momentum=0.5)
    variables = m.init(key, x, use_running_average=False)
    y, state = m.apply(variables, x, use_running_average=False, mutable=["batch_stats"])
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2
    # running stats moved toward batch stats from (0, 1)
    assert float(state["batch_stats"]["mean"].mean()) > 1.0
    # inference path uses running stats and is deterministic
    y_eval = m.apply({"params": variables["params"], **state}, x, use_running_average=True)
    assert y_eval.shape == x.shape


def test_cond_batchnorm_selects_per_label_gamma_beta():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 2, 2, 4))
    labels = jnp.array([0, 1] * 4)
    m = ops.ConditionalBatchNorm(num_classes=3)
    variables = m.init(key, x, labels, use_running_average=False)
    # set distinctive gammas per class
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    params["gamma"]["embedding"] = jnp.array(
        [[2.0] * 4, [5.0] * 4, [1.0] * 4], jnp.float32
    )
    params["beta"]["embedding"] = jnp.array(
        [[1.0] * 4, [-1.0] * 4, [0.0] * 4], jnp.float32
    )
    y, _ = m.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x, labels, use_running_average=False, mutable=["batch_stats"],
    )
    y = np.asarray(y)
    # class-0 rows scaled by 2 shifted +1; class-1 rows by 5 shifted -1.
    base, _ = m.apply(
        {"params": jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a) if a.ndim == 2 else a, params)
         | {"gamma": {"embedding": jnp.ones((3, 4))},
            "beta": {"embedding": jnp.zeros((3, 4))}},
        "batch_stats": variables["batch_stats"]},
        x, labels, use_running_average=False, mutable=["batch_stats"],
    )
    base = np.asarray(base)
    np.testing.assert_allclose(y[0], base[0] * 2 + 1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y[1], base[1] * 5 - 1, rtol=1e-5, atol=1e-5)


def test_layernorm_per_sample():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 8, 8, 16)) * 2 + 3
    m = ops.LayerNorm()
    variables = m.init(key, x)
    y = np.asarray(m.apply(variables, x))
    for i in range(4):
        assert abs(y[i].mean()) < 1e-4
        assert abs(y[i].std() - 1.0) < 1e-2


def test_pixel_norm_unit_rms():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 4, 32)) * 7
    y = np.asarray(ops.pixel_norm(x))
    rms = np.sqrt((y**2).mean(axis=-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-3)


def test_minibatch_stddev_appends_one_channel():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4, 4, 6))
    y = ops.minibatch_stddev(x, group_size=4)
    assert y.shape == (8, 4, 4, 7)
    # original channels untouched
    np.testing.assert_allclose(np.asarray(y[..., :6]), np.asarray(x))
    # constant over H, W within a sample
    feat = np.asarray(y[..., 6])
    for i in range(8):
        assert feat[i].std() < 1e-6
    # zero stddev input -> near-zero feature
    z = ops.minibatch_stddev(jnp.ones((4, 2, 2, 3)), group_size=4)
    assert float(np.asarray(z[..., 3]).max()) < 1e-3

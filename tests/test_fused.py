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


def test_downscale_fused_matches_composed():
    """conv_downscale2x == downsample_avg(conv_same(x, w)) exactly (the
    D-side dual, used by PGGAN fused_from)."""
    from gan_lib_tensorflow_tpu.ops.fused import conv_downscale2x

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12, 5))
    for k in (3, 1):
        w = jax.random.normal(jax.random.PRNGKey(k + 10), (k, k, 5, 6))
        ref = ops.downsample_avg(jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        got = conv_downscale2x(x, w)
        assert got.shape == ref.shape == (2, 4, 6, 6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_downscale_module_parity_and_grads():
    from gan_lib_tensorflow_tpu.ops.fused import conv_downscale2x
    from gan_lib_tensorflow_tpu.ops.layers import DownsampleConv

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    fused = DownsampleConv(6, 3, fused=True)
    plain = DownsampleConv(6, 3, fused=False)
    variables = fused.init(jax.random.PRNGKey(4), x)
    np.testing.assert_allclose(np.asarray(fused.apply(variables, x)),
                               np.asarray(plain.apply(variables, x)),
                               rtol=1e-5, atol=1e-5)
    assert variables["params"]["kernel"].shape == (3, 3, 4, 6)

    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 4, 2))

    def loss_fused(w):
        return jnp.sum(jnp.square(conv_downscale2x(x, w)))

    def loss_ref(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.square(ops.downsample_avg(y)))

    np.testing.assert_allclose(np.asarray(jax.grad(loss_fused)(w)),
                               np.asarray(jax.grad(loss_ref)(w)),
                               rtol=1e-4, atol=1e-4)


def test_pggan_d_fused_from_param_compat():
    """fused_from toggling must not change the D param structure (checkpoints
    and migrate_params stay interchangeable), and the fused net must run."""
    from gan_lib_tensorflow_tpu.models import pggan

    x = jax.random.normal(jax.random.PRNGKey(6), (4, 16, 16, 3))
    d_plain = pggan.PGGANDiscriminator(resolution=16, width_mul=1 / 32,
                                       mbstd_group_size=2)
    d_fused = pggan.PGGANDiscriminator(resolution=16, width_mul=1 / 32,
                                       mbstd_group_size=2, fused_from=8)
    v_plain = d_plain.init(jax.random.PRNGKey(7), x)
    v_fused = d_fused.init(jax.random.PRNGKey(7), x)
    flat_p = jax.tree_util.tree_map(np.shape, v_plain)
    flat_f = jax.tree_util.tree_map(np.shape, v_fused)
    assert jax.tree_util.tree_structure(flat_p) == jax.tree_util.tree_structure(flat_f)
    assert jax.tree_util.tree_leaves(flat_p) == jax.tree_util.tree_leaves(flat_f)
    # same params drive both variants; outputs differ only by the documented
    # lrelu/pool reorder (finite, same shape)
    y = d_fused.apply(v_plain, x)
    assert y.shape == (4, 1) and np.all(np.isfinite(np.asarray(y)))


def test_sn_downsample_conv_matches_sn_conv_then_pool():
    """SN'd DownsampleConv == SN-Conv then avg-pool, sharing the same params
    and sn u-state (SNGAN D down-block fusion; sigma is computed on the raw
    3x3 kernel in both paths)."""
    from gan_lib_tensorflow_tpu.ops.layers import Conv, DownsampleConv

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 4))
    fused = DownsampleConv(6, 3, spectral_norm=True)
    composed = Conv(6, 3, spectral_norm=True)
    variables = fused.init(jax.random.PRNGKey(9), x)
    ref = ops.downsample_avg(composed.apply(variables, x))
    got = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # u-state advances identically in both paths under update_sn
    _, su_f = fused.apply(variables, x, update_sn=True, mutable=["sn"])
    _, su_c = composed.apply(variables, x, update_sn=True, mutable=["sn"])
    np.testing.assert_allclose(np.asarray(su_f["sn"]["u"]),
                               np.asarray(su_c["sn"]["u"]), rtol=1e-6)


def test_sngan_disc_blocks_fused_parity():
    """Fused SNGAN D blocks == composed blocks with the SAME variables (exact
    up to float reassociation): conv2+pool fusion and the commuted 1x1 skip."""
    from gan_lib_tensorflow_tpu.ops.blocks import (DiscOptimizedBlock,
                                                   DiscResBlock)

    x = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 16, 3))
    opt_f, opt_p = DiscOptimizedBlock(12, fused=True), DiscOptimizedBlock(12, fused=False)
    v = opt_f.init(jax.random.PRNGKey(11), x)
    np.testing.assert_allclose(np.asarray(opt_f.apply(v, x)),
                               np.asarray(opt_p.apply(v, x)),
                               rtol=1e-5, atol=1e-5)

    h = jax.random.normal(jax.random.PRNGKey(12), (2, 16, 16, 12))
    res_f = DiscResBlock(24, downsample=True, fused=True)
    res_p = DiscResBlock(24, downsample=True, fused=False)
    v = res_f.init(jax.random.PRNGKey(13), h)
    v2 = res_p.init(jax.random.PRNGKey(13), h)
    # identical param/sn structure in both modes (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2))
    np.testing.assert_allclose(np.asarray(res_f.apply(v, h)),
                               np.asarray(res_p.apply(v, h)),
                               rtol=1e-5, atol=1e-5)

    # gradients through the fused block match the composed form
    def loss(variables, blk):
        return jnp.sum(jnp.square(blk.apply(variables, h)))

    gf = jax.grad(loss)(v, res_f)
    gp = jax.grad(loss)(v, res_p)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

"""Exactness tests for the space-to-depth conv rewrites (ops/s2d.py).

Every transform must be numerically exact (fp32, tolerance for conv
reassociation only) against the composed normal-layout form, including
SAME-padding edge behavior and gradients — the S2D path is a compute-layout
knob and must never change the function computed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_lib_tensorflow_tpu.ops import s2d
from gan_lib_tensorflow_tpu.ops import downsample_avg, upsample_nearest


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_s2d_roundtrip():
    x = _rand(jax.random.PRNGKey(0), (2, 8, 6, 5))
    y = s2d.space_to_depth(x)
    assert y.shape == (2, 4, 3, 20)
    np.testing.assert_array_equal(s2d.depth_to_space(y), x)
    # phase-major layout: channel (py*2+px)*C + c == pixel (2i+py, 2j+px, c)
    np.testing.assert_array_equal(y[0, 1, 1, 3 * 5 + 2], x[0, 3, 3, 2])


@pytest.mark.parametrize("k", [1, 3, 5])
def test_s2d_conv_kernel_exact(k):
    kx, kw = jax.random.split(jax.random.PRNGKey(k))
    x = _rand(kx, (2, 12, 8, 6))
    w = _rand(kw, (k, k, 6, 10))
    want = s2d.space_to_depth(_conv(x, w))
    got = s2d.conv_same(s2d.space_to_depth(x), s2d.s2d_conv_kernel(w))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_s2d_upconv_kernel_exact():
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = _rand(kx, (2, 6, 5, 4))
    w = _rand(kw, (3, 3, 4, 9))
    want = s2d.space_to_depth(_conv(upsample_nearest(x), w))
    got = s2d.conv_same(x, s2d.s2d_upconv_kernel(w))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_s2d_downconv_kernel_exact():
    kx, kw = jax.random.split(jax.random.PRNGKey(11))
    x = _rand(kx, (2, 12, 10, 6))
    w = _rand(kw, (3, 3, 6, 8))
    want = downsample_avg(_conv(x, w))
    got = s2d.conv_same(s2d.space_to_depth(x), s2d.s2d_downconv_kernel(w))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_s2d_conv_gradients_exact():
    kx, kw = jax.random.split(jax.random.PRNGKey(3))
    x = _rand(kx, (1, 8, 8, 4))
    w = _rand(kw, (3, 3, 4, 4))

    def f_ref(w):
        return (s2d.space_to_depth(_conv(x, w)) ** 2).sum()

    def f_s2d(w):
        return (s2d.conv_same(s2d.space_to_depth(x),
                              s2d.s2d_conv_kernel(w)) ** 2).sum()

    np.testing.assert_allclose(jax.grad(f_s2d)(w), jax.grad(f_ref)(w),
                               atol=5e-4, rtol=1e-4)


def test_pixel_norm_s2d_matches():
    from gan_lib_tensorflow_tpu.ops import pixel_norm
    x = _rand(jax.random.PRNGKey(5), (2, 8, 8, 6))
    want = s2d.space_to_depth(pixel_norm(x))
    got = s2d.pixel_norm_s2d(s2d.space_to_depth(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pggan_generator_s2d_matches_composed():
    """Model-level: s2d_from produces the same function (same params) as the
    composed path — forward AND a training-style gradient."""
    from gan_lib_tensorflow_tpu.models import pggan

    g0 = pggan.PGGANGenerator(resolution=32, width_mul=1 / 32, z_dim=16)
    g1 = pggan.PGGANGenerator(resolution=32, width_mul=1 / 32, z_dim=16,
                              s2d_from=16)
    z = _rand(jax.random.PRNGKey(1), (3, 16))
    params = g0.init(jax.random.PRNGKey(2), z, 1.0)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(g1.init(jax.random.PRNGKey(2), z, 1.0))
    np.testing.assert_allclose(g1.apply(params, z, 1.0),
                               g0.apply(params, z, 1.0), atol=2e-5, rtol=1e-5)
    # fade-in branch too (prev-level path may be in s2d space)
    g0f = pggan.PGGANGenerator(resolution=32, width_mul=1 / 32, z_dim=16,
                               fade_in=True)
    g1f = pggan.PGGANGenerator(resolution=32, width_mul=1 / 32, z_dim=16,
                               fade_in=True, s2d_from=16)
    pf = g0f.init(jax.random.PRNGKey(2), z, 0.5)
    np.testing.assert_allclose(g1f.apply(pf, z, 0.5), g0f.apply(pf, z, 0.5),
                               atol=2e-5, rtol=1e-5)

    def loss(p, g):
        return (g.apply(p, z, 1.0) ** 2).mean()

    got = jax.grad(loss)(params, g1)
    want = jax.grad(loss)(params, g0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4),
        got, want)


def test_pggan_discriminator_s2d_matches_fused():
    """s2d_from implies the fused_scale nonlinearity ordering, so parity is
    against fused_from at the same levels (params identical either way)."""
    from gan_lib_tensorflow_tpu.models import pggan

    d0 = pggan.PGGANDiscriminator(resolution=32, width_mul=1 / 32,
                                  mbstd_group_size=2, fused_from=16)
    d1 = pggan.PGGANDiscriminator(resolution=32, width_mul=1 / 32,
                                  mbstd_group_size=2, s2d_from=16)
    x = _rand(jax.random.PRNGKey(4), (4, 32, 32, 3))
    params = d0.init(jax.random.PRNGKey(5), x, 1.0)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(d1.init(jax.random.PRNGKey(5), x, 1.0))
    np.testing.assert_allclose(d1.apply(params, x, 1.0),
                               d0.apply(params, x, 1.0), atol=5e-5, rtol=1e-4)
    # fade-in blend path
    d0f = pggan.PGGANDiscriminator(resolution=32, width_mul=1 / 32,
                                   mbstd_group_size=2, fused_from=16,
                                   fade_in=True)
    d1f = pggan.PGGANDiscriminator(resolution=32, width_mul=1 / 32,
                                   mbstd_group_size=2, s2d_from=16,
                                   fade_in=True)
    pf = d0f.init(jax.random.PRNGKey(5), x, 0.5)
    np.testing.assert_allclose(d1f.apply(pf, x, 0.5), d0f.apply(pf, x, 0.5),
                               atol=5e-5, rtol=1e-4)

    def loss(p, d):
        return (d.apply(p, x, 1.0) ** 2).mean()

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3),
        jax.grad(loss)(params, d1), jax.grad(loss)(params, d0))

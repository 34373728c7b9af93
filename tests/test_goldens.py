"""Fixed-PRNG forward goldens for every model family (SURVEY.md §4: regression
guards, not TF1 parity — exact TF1 RNG parity is unattainable; parity is
distributional). Recorded on CPU float32 with highest matmul precision
(tests/conftest.py); loose tolerances absorb compiler-version drift while
still catching real numeric changes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_lib_tensorflow_tpu.models import acgan, pggan, pix2pix, sngan

# (mean, std) of the forward output at fixed seeds, recorded 2026-08-16 (pggan re-recorded after the block-submodule restructure changed init RNG folding).
GOLDENS = {
    "sngan_g": (-0.145901, 0.565859),
    "sngan_d": (-18.63792, 1.245726),
    "acgan_g": (0.051591, 0.386537),
    "pggan_g": (-0.067347, 0.590629),
    "pggan_d": (0.886208, 0.082662),
    "unet_g": (0.086939, 0.481073),
    # recorded 2026-08-17 with the exact reference PatchGAN layout
    # (pad1+VALID chain -> 30x30 at 256^2, 6x6 at the 64^2 golden size);
    # no earlier golden existed for this head (round-3 changelog)
    "patchgan_d": (0.42473, 0.889458),
}

# Fixed output slices (images: y[0,:3,:3,0]; logits: ravel()[:8]) at the same
# seeds — structural regressions (e.g. a permuted skip connection) that
# happen to preserve mean/std cannot also preserve these.
GOLDEN_SLICES = {
    "sngan_g": [0.064951, -0.165575, -0.171722, 0.381642, 0.350095, 0.319033,
                0.265732, 0.15237, 0.280295],
    "sngan_d": [-20.552593, -18.864624, -17.253214, -17.88125],
    "acgan_g": [0.116955, -0.014312, 0.032821, 0.036987, -0.16074, 0.066264,
                -0.030203, 0.228715, 0.140782],
    "pggan_g": [1.069491, 1.097411, 0.470536, 0.942906, 0.8245, -0.057512,
                0.929526, 0.939141, 0.001947],
    "pggan_d": [0.945251, 0.989273, 0.798648, 0.811662],
    "unet_g": [-0.082789, 0.007407, 0.357981, -0.156298, 0.806295, -0.593934,
               0.026325, 0.328704, -0.177315],
    "patchgan_d": [1.997564, 0.623326, 0.032673, 2.839132, 0.075661,
                   -0.481261, 0.667523, 0.39541, 1.919137],
}


def _slice_of(arr):
    arr = np.asarray(arr, np.float64)
    if arr.ndim == 4:  # NHWC image
        return arr[0, :3, :3, 0].ravel()
    return arr.ravel()[:8]


def _check(name, arr, rtol=2e-3):
    mean, std = GOLDENS[name]
    arr = np.asarray(arr, np.float64)
    np.testing.assert_allclose(arr.mean(), mean, rtol=rtol, atol=1e-4,
                               err_msg=f"{name} mean drifted")
    np.testing.assert_allclose(arr.std(), std, rtol=rtol, atol=1e-4,
                               err_msg=f"{name} std drifted")
    np.testing.assert_allclose(_slice_of(arr), GOLDEN_SLICES[name],
                               rtol=rtol, atol=1e-4,
                               err_msg=f"{name} output slice drifted")


def test_sngan_goldens():
    g = sngan.ResNetGenerator(channels=(16, 16), bottom_ch=16, z_dim=8)
    z = jax.random.normal(jax.random.PRNGKey(42), (4, 8))
    y, _ = g.init_with_output(jax.random.PRNGKey(7), z, train=True)
    _check("sngan_g", y)
    d = sngan.ResNetDiscriminator(channels=(16, 16), downsample=(True, False))
    x = jax.random.normal(jax.random.PRNGKey(43), (4, 16, 16, 3))
    logits, _ = d.init_with_output(jax.random.PRNGKey(8), x)
    _check("sngan_d", logits)


def test_acgan_golden():
    g = acgan.ACGANGenerator(base_ch=32, z_dim=16)
    z = jax.random.normal(jax.random.PRNGKey(44), (4, 16))
    y, _ = g.init_with_output(jax.random.PRNGKey(9), z, jnp.arange(4), train=True)
    _check("acgan_g", y)


def test_pggan_goldens():
    g = pggan.PGGANGenerator(resolution=16, fade_in=True, z_dim=16, width_mul=1 / 32)
    z = jax.random.normal(jax.random.PRNGKey(45), (4, 16))
    y, _ = g.init_with_output(jax.random.PRNGKey(10), z, 0.5)
    _check("pggan_g", y)
    d = pggan.PGGANDiscriminator(resolution=16, fade_in=True, width_mul=1 / 32,
                                 mbstd_group_size=2)
    logits, _ = d.init_with_output(jax.random.PRNGKey(11), y, 0.5)
    _check("pggan_d", logits)


def test_unet_golden():
    g = pix2pix.UNetGenerator(base_ch=4)
    x = jax.random.normal(jax.random.PRNGKey(46), (1, 64, 64, 3))
    y, _ = g.init_with_output(
        {"params": jax.random.PRNGKey(12), "dropout": jax.random.PRNGKey(13)},
        x, train=True)
    _check("unet_g", y)


def test_patchgan_golden():
    d = pix2pix.PatchGANDiscriminator(base_ch=4)
    a = jax.random.normal(jax.random.PRNGKey(47), (1, 64, 64, 3))
    b = jax.random.normal(jax.random.PRNGKey(48), (1, 64, 64, 3))
    y, _ = d.init_with_output(jax.random.PRNGKey(14), a, b, train=False)
    assert y.shape == (1, 6, 6, 1)  # pad1+VALID chain at 64^2
    _check("patchgan_d", y)

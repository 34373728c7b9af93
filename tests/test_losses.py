"""Loss-zoo unit tests, incl. the gradient-penalty finite-difference oracle
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu import losses


def test_hinge_values():
    real = jnp.array([2.0, 0.5])
    fake = jnp.array([-2.0, 0.0])
    # relu(1-2)=0, relu(1-0.5)=0.5 -> 0.25 ; relu(1-2)=0, relu(1+0)=1 -> 0.5
    np.testing.assert_allclose(float(losses.hinge_d_loss(real, fake)), 0.75)
    np.testing.assert_allclose(float(losses.hinge_g_loss(fake)), 1.0)


def test_wgan_values():
    real = jnp.array([1.0, 3.0])
    fake = jnp.array([0.0, 2.0])
    np.testing.assert_allclose(float(losses.wgan_d_loss(real, fake)), -1.0)
    np.testing.assert_allclose(float(losses.wgan_g_loss(fake)), -1.0)


def test_bce_matches_reference_probability_form():
    """softplus logit form == -log(sigmoid) probability form (pix2pix)."""
    real = jnp.array([0.3, -1.2])
    fake = jnp.array([0.7, 2.0])
    expected = float(-jnp.mean(jnp.log(jax.nn.sigmoid(real)))
                     - jnp.mean(jnp.log(1 - jax.nn.sigmoid(fake))))
    np.testing.assert_allclose(float(losses.bce_d_loss(real, fake)), expected, rtol=1e-3)
    expected_g = float(-jnp.mean(jnp.log(jax.nn.sigmoid(fake))))
    np.testing.assert_allclose(float(losses.bce_g_loss(fake)), expected_g, rtol=1e-3)


def test_acgan_aux_is_cross_entropy():
    logits = jnp.array([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    labels = jnp.array([0, 1])
    expected = -np.mean([jax.nn.log_softmax(logits[0])[0],
                         jax.nn.log_softmax(logits[1])[1]])
    np.testing.assert_allclose(float(losses.acgan_aux_loss(logits, labels)),
                               expected, rtol=1e-4)


def test_gradient_penalty_analytic_linear_critic():
    """For critic f(x) = <w, x>, grad = w everywhere, so
    GP = (||w|| - 1)^2 exactly, independent of the interpolates."""
    w = jnp.array([3.0, 4.0])  # ||w|| = 5
    critic = lambda x: x @ w
    real = jnp.ones((8, 2))
    fake = -jnp.ones((8, 2))
    gp = losses.gradient_penalty(critic, real, fake, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(gp), 16.0, rtol=1e-5)


def test_gradient_penalty_finite_difference_oracle():
    """GP's inner grad on a tiny MLP critic matches finite differences.
    Run in float64 — float32 cancellation noise swamps eps=1e-5 differences."""
    with jax.enable_x64(True):
        rng = np.random.default_rng(0)
        w1 = jnp.asarray(rng.standard_normal((6, 16)) * 0.5)
        w2 = jnp.asarray(rng.standard_normal((16, 1)) * 0.5)

        def critic(x):
            return jnp.tanh(x @ w1) @ w2

        x = jnp.asarray(rng.standard_normal((3, 6)))
        g_auto = jax.grad(lambda x: jnp.sum(critic(x)))(x)
        eps = 1e-5
        g_fd = np.zeros((3, 6))
        for i in range(3):
            for j in range(6):
                dx = np.zeros_like(g_fd)
                dx[i, j] = eps
                g_fd[i, j] = float(
                    (jnp.sum(critic(x + dx)) - jnp.sum(critic(x - dx))) / (2 * eps))
        np.testing.assert_allclose(np.asarray(g_auto), g_fd, rtol=1e-6, atol=1e-8)


def test_gradient_penalty_double_backward_finite():
    """d(GP)/d(critic params) — the WGAN-GP double backward — is finite."""
    key = jax.random.PRNGKey(0)
    params = {"w1": jax.random.normal(key, (6, 16)) * 0.5,
              "w2": jax.random.normal(jax.random.PRNGKey(1), (16, 1)) * 0.5}
    real = jax.random.normal(jax.random.PRNGKey(2), (4, 6))
    fake = jax.random.normal(jax.random.PRNGKey(3), (4, 6))

    def gp_of_params(p):
        critic = lambda x: jnp.tanh(x @ p["w1"]) @ p["w2"]
        return losses.gradient_penalty(critic, real, fake, jax.random.PRNGKey(4))

    grads = jax.grad(gp_of_params)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
        assert float(jnp.abs(leaf).max()) > 0  # nontrivial


def test_drift_penalty():
    np.testing.assert_allclose(
        float(losses.drift_penalty(jnp.array([1.0, -3.0]))), 5.0)

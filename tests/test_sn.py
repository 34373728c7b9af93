"""Spectral-norm tests: convergence to the true top singular value, update
gating, and gradient semantics (SURVEY.md §4 unit-test spec)."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_lib_tensorflow_tpu import ops
from gan_lib_tensorflow_tpu.ops.sn import power_iteration


def test_power_iteration_converges_to_top_singular_value():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 32))
    true_sigma = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
    u = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    sigma, u = power_iteration(w, u, n_iters=50)
    assert abs(float(sigma) - true_sigma) / true_sigma < 1e-4


def test_one_step_iteration_converges_over_calls():
    """The reference uses ONE power step per forward call; sigma converges
    across repeated calls as `u` warm-starts — replicate that here."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (64, 32))
    true_sigma = float(np.linalg.svd(np.asarray(w), compute_uv=False)[0])
    u = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    for _ in range(100):
        sigma, u = power_iteration(w, u, n_iters=1)
    assert abs(float(sigma) - true_sigma) / true_sigma < 1e-3


def test_sn_dense_u_updates_only_when_requested():
    key = jax.random.PRNGKey(0)
    m = ops.Dense(32, spectral_norm=True)
    x = jnp.ones((4, 16))
    variables = m.init(key, x)
    u0 = variables["sn"]["u"]

    # update_sn=False with mutable: u must NOT change
    _, new_state = m.apply(variables, x, update_sn=False, mutable=["sn"])
    np.testing.assert_allclose(np.asarray(new_state["sn"]["u"]), np.asarray(u0))

    # update_sn=True: u advances
    _, new_state = m.apply(variables, x, update_sn=True, mutable=["sn"])
    assert not np.allclose(np.asarray(new_state["sn"]["u"]), np.asarray(u0))


def test_sn_normalizes_spectral_norm_to_one():
    """After enough u warm-up, the effective kernel W/sigma has top singular
    value ~1."""
    key = jax.random.PRNGKey(0)
    m = ops.Dense(32, spectral_norm=True, use_bias=False)
    x = jnp.eye(16)
    variables = m.init(key, x)
    state = variables
    for _ in range(50):
        _, sn_state = m.apply(state, x, update_sn=True, mutable=["sn"])
        state = {"params": variables["params"], "sn": sn_state["sn"]}
    # Effective linear map = apply to identity
    w_eff = np.asarray(m.apply(state, x, update_sn=False))
    sigma = np.linalg.svd(w_eff, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-3


def test_sn_gradient_flows_through_w_only():
    """d sigma / dW = u v^T (u, v stop-gradiented) — so the grad of
    sum(W/sigma) w.r.t. W must match the analytic quotient-rule form."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (8, 4))
    u = jax.random.normal(jax.random.PRNGKey(1), (1, 4))
    # converge u first
    for _ in range(100):
        sigma, u = power_iteration(w, u, n_iters=1)

    def f(w):
        sigma, _ = power_iteration(w, u, n_iters=1)
        return jnp.sum(w / sigma)

    g = jax.grad(f)(w)
    # Analytic: grad = 1/sigma - (sum(W)/sigma^2) * u_vec v_vec outer
    sigma, _ = power_iteration(w, u, n_iters=1)
    v = u @ w.T
    v = v / np.linalg.norm(v)
    uu = v @ w
    uu = uu / np.linalg.norm(uu)
    analytic = 1.0 / sigma - (jnp.sum(w) / sigma**2) * (v.T @ uu)
    np.testing.assert_allclose(np.asarray(g), np.asarray(analytic), rtol=1e-4, atol=1e-5)

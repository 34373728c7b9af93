"""Test configuration: force an 8-virtual-device CPU JAX so every pjit/
shard_map path is exercised without TPU hardware (SURVEY.md §4).

Gotcha: this environment's sitecustomize registers the axon TPU PJRT plugin
at interpreter start and sets ``jax.config.jax_platforms='axon,cpu'`` — which
overrides the JAX_PLATFORMS env var. We must override the *config*, before
any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, f"expected 8 CPU devices, got {jax.devices()}"

"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). The env vars must be set before
jax initializes its backends, hence this module-level setup.
"""

import os

# Force CPU even if the ambient environment points at a TPU backend: tests
# must not depend on (or monopolize) the real chip. NOTE: in this image a
# sitecustomize pre-imports jax and registers a TPU plugin with
# JAX_PLATFORMS=axon, so the env var alone is too late — the config update
# below (before any backend initialization) is what actually pins CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

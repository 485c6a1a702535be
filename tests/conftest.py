"""Test configuration: force CPU with a virtual 8-device mesh so sharding
tests run without TPU hardware, and enable x64 so float64/complex128 numpy
references keep full precision.

Note: the environment preloads jax via sitecustomize (PYTHONPATH
/root/.axon_site) with JAX_PLATFORMS=axon, so the platform must be forced
through jax.config *after* import rather than via the env var.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

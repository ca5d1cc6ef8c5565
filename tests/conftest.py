"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-native "fake cluster" the reference lacks (SURVEY.md §4):
all sharding/collective tests run on 8 virtual CPU devices so they work on
any machine, while the compiled programs are the same ones a real TPU slice
would run.

Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Note: the JAX_PLATFORMS env var is ignored under this image's TPU tunnel
# plugin; the config update below is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, jax.devices()

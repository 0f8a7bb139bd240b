"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # the session env pins axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon (TPU tunnel) backend
# and force-sets jax_platforms="axon,cpu"; tests must run on the local
# virtual CPU devices, so override the config, not just the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

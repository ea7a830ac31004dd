"""Test configuration: CPU backend with 8 virtual devices + fp64 enabled.

The reference has no simulated-distributed tests (SURVEY.md §4); we close that
gap by running every mesh test on an 8-device virtual CPU mesh.

Note: the environment may pre-import jax and pin JAX_PLATFORMS (TPU plugin
sitecustomize), so the platform override must go through jax.config *after*
import — plain env vars are ignored once jax is loaded.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

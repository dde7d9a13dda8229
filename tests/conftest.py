"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (SURVEY.md §4: multi-host simulation via
``xla_force_host_platform_device_count``).

``jax.config.update`` is used in addition to the env vars because pytest
plugins may import jax before this conftest runs; the config update still
wins as long as no backend has been initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on CPU, got {jax.devices()}"
)

"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (SURVEY.md §4: multi-host simulation via
``xla_force_host_platform_device_count``).

``jax.config.update`` is used in addition to the env vars because pytest
plugins may import jax before this conftest runs; the config update still
wins as long as no backend has been initialized.
"""

import os

import pytest

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

# LLVM's ORC JIT mmaps ~3 regions (r-x/r--/rw-) per compiled XLA:CPU
# executable and Linux caps a process at vm.max_map_count (65530 here)
# mappings. A full-suite run compiles enough graphs to hit the cap, at
# which point the next compile's mmap fails and the JIT SEGFAULTS
# (observed deterministically ~80% into `pytest tests/`, inside
# backend_compile_and_load on a trivial reduce). Dropping jax's jit
# caches releases the executables and their code pages (measured:
# 4868 -> 497 maps), so shed them whenever the count gets close.
_MAP_GUARD_THRESHOLD = 45_000


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:  # non-Linux: no map cap to manage
        return
    if n > _MAP_GUARD_THRESHOLD:
        jax.clear_caches()

"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (JAX reads them at first import
use).  Multi-chip sharding tests then see 8 devices without TPU hardware.
"""

import os

# Force CPU with 8 virtual devices.  NOTE: this environment pre-imports
# jax at interpreter startup (sitecustomize registers the TPU-tunnel
# backend and sets jax_platforms=axon), so plain env vars are read too
# late — the config must be updated through jax.config before any backend
# initializes.  XLA_FLAGS is still read lazily at backend init, so the
# host-device-count flag can go through the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xB15EA7)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full suite compiles hundreds of distinct XLA:CPU programs in one
    process; with all of them held live, a later compile segfaults
    deterministically inside ``backend_compile_and_load`` (observed at
    the ~78th test, test_pw.py, on this single-CPU box — partial runs of
    any subset pass).  Clearing the cache between modules keeps the
    accumulated JIT state bounded; cross-module cache reuse is ~nil
    anyway (each module uses its own shapes)."""
    yield
    jax.clear_caches()

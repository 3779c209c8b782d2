"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's ``sitecustomize.py`` registers a remote TPU ("axon") backend
in every interpreter and forces ``JAX_PLATFORMS=axon``, so plain env vars set
here are too late / overridden. Instead we override the jax config directly
before any backend is initialized (pytest itself never touches jax before
conftest import).
"""
import os

# Must be set before the first backend init for the host-platform device
# count to take effect.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: the suite is compile-dominated on this
# 2-core box (same programs recompile every run otherwise)
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, "out", "jaxcache-cpu")
)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

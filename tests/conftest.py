"""Test configuration: run JAX on CPU with a virtual 8-device mesh so the
multi-chip sharding paths are testable without TPU hardware."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fqtool_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon sitecustomize force-registers the remote TPU at interpreter startup
# (it sets jax_platforms="axon,cpu" ahead of us), so env vars alone cannot
# select CPU -- update the config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oracle():
    from .oracle import Oracle
    return Oracle.build()

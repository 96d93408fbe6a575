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


# ---------------------------------------------------------------------------
# quick tier: `pytest -m quick` is the <3-minute smoke path (fast unit /
# kernel / writer tests plus two end-to-end goldens); the full oracle-golden
# and mesh e2e modules are marked slow.  VERDICT round-3 item 9.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_golden_se", "test_golden_pe", "test_golden_matrix",
    "test_golden_fuzz", "test_golden_random", "test_golden_kitchen_sink",
    "test_golden_features", "test_golden_edge", "test_golden_malformed",
    "test_sharded_e2e", "test_multihost", "test_html_dom", "test_reports",
    "test_cli_rejection", "test_dist", "test_headcache",
}

# end-to-end smoke goldens promoted into the quick tier (one SE, one PE)
_QUICK_SMOKE = {
    "test_se_quality_filter_trims",   # tests/test_golden_se.py
    "test_pe_quality_filter",         # tests/test_golden_pe.py
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in _SLOW_MODULES and name not in _QUICK_SMOKE:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)

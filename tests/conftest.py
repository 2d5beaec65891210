"""Test configuration: run on CPU with 8 virtual devices.

The environment pre-imports jax (axon sitecustomize) with the TPU backend
selected, so we override the platform via jax.config before any backend is
initialized.  Multi-chip sharding tests exercise a virtual 8-device mesh via
``--xla_force_host_platform_device_count`` (the reference's analog is
asserting matmul_par == matmul without a cluster, linalg/src/csr.rs:974-988).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the host is single-core, so re-jitting the ESC
# pipeline per capacity bucket dominates test time without it.  CPU tests
# get their OWN cache dir: sharing with a concurrently-running TPU bench
# produced a segfault in the cache reader (entries are disjoint across
# backends anyway, so nothing is lost)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "long: long-running benchmark-style tests (reference long-tests feature)"
    )


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap the suite's resident memory: the in-memory executable caches of
    ~260 accumulated tests pushed the XLA:CPU compiler into a segfault on
    the largest interpret-mode Pallas programs (deterministic at the same
    test across runs).  The persistent on-disk cache still makes
    recompiles cheap."""
    yield
    import jax as _jax

    _jax.clear_caches()

"""Test configuration: force a virtual 8-device CPU mesh and enable f64.

The container's sitecustomize imports jax at interpreter startup and points
it at a tunneled TPU backend (JAX_PLATFORMS=axon), which is far too slow for
a test loop. `jax.config.update` still works post-import as long as no
computation has run, so we flip the platform here; XLA_FLAGS must be set
before the first backend initialization.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache for the test suite (separate from the TPU
# bench cache). Makes reruns mostly cache loads, which both speeds the
# loop and makes a retry after a flaky XLA compile crash (r3:
# backend_compile_and_load segfault under memory pressure on 2-core
# hosts) skip the already-compiled modules — see tools/run_tests.sh.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory_per_module():
    """Drop compiled executables between test modules.

    A full-suite process accumulates hundreds of live XLA executables;
    on 2-core/low-memory hosts the next big CPU compile then segfaults
    inside backend_compile_and_load (r3 tests_full_r3.log, reproduced
    deterministically in r4 at tests/test_shading.py two-thirds through
    the suite). Clearing per module bounds the live set; the persistent
    cache makes cross-module recompiles cheap loads.
    """
    yield
    jax.clear_caches()

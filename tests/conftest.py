import os
import sys

# The ambient environment routes everything through a TPU tunnel plugin
# (PYTHONPATH=/root/.axon_site, JAX_PLATFORMS=axon) whose remote compile
# service is slow and lacks f64 linalg.  Tests run on a genuine local CPU
# backend with a virtual 8-device mesh for the sharding tests.  jax may
# already be imported by a pytest plugin, so reconfigure at runtime.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu", (
    "tests must run on the local CPU backend; got " + jax.default_backend()
)


# Accumulating ~170 tests of compiled executables in one process makes a
# subsequent XLA:CPU execution segfault (deterministic at the same suite
# position; RSS/threads/fds all healthy — an XLA:CPU executable-arena
# issue, not a resource limit).  Dropping executables between modules
# keeps the live set small; the persistent compile cache makes the
# reloads cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()

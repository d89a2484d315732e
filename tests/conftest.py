"""Test harness config: CPU platform with 8 virtual devices + float64.

Runs the whole suite on the host CPU (SURVEY §4: "1 vs N shards must agree
... testable on CPU via xla_force_host_platform_device_count") so tests are
hermetic and sharding tests get a virtual 8-device mesh.
"""

import os

# must be set before jax initializes any backend
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: repeated suite runs skip XLA compiles (same
# cache the production runners use)
from poroelasticity_dealii_tpu.models.runner import enable_compile_cache  # noqa: E402

enable_compile_cache()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The suite compiles hundreds of distinct XLA programs; each loaded
    executable holds mmap'd code pages, and a single long pytest process
    eventually exhausts vm.max_map_count (default 65530) — observed as a
    segfault inside a *fresh* XLA compile near the end of the full suite,
    reproducible only with the preceding suite state and with modest RSS.
    Dropping jit caches per module lets executables be GC'd and unmapped;
    within-module reuse (the expensive repeated solver compiles) is kept.
    """
    yield
    jax.clear_caches()

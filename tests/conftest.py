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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

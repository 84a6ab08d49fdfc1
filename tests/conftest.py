"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

All tests run on CPU so sharding logic is validated without TPU hardware
(the driver separately dry-runs the multi-chip path; bench runs on real TPU).
"""

import os

# Must be set before the first `import jax` anywhere in the test process.
# Overrides any ambient platform selection (e.g. a tunneled TPU): tests are
# CPU-only so the 8-device virtual mesh is available.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU hard-aborts the process when one collective participant takes
    # >40 s to reach the rendezvous — on a 1-core host, 8 virtual devices
    # timesharing full-328M programs routinely exceed that (observed:
    # dp-pair all-reduce abort in test_fullsize_execution). Lengthen the
    # crash timeout; harmless on multi-core hosts.
    flags = flags + " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# A pytest plugin (jaxtyping) may import jax before this conftest runs, which
# latches config defaults from the ambient env (e.g. JAX_PLATFORMS=axon for a
# tunneled TPU). Override explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

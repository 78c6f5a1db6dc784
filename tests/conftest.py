"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip collective code paths are exercised on host CPU devices (the
"fake backend" testing mode; the reference's analogue is running its ROS
multi-process stack on one laptop — SURVEY.md §4.4). Real-TPU benchmarks run
separately via bench.py.

Note: this environment pre-registers a TPU ("axon") PJRT plugin via
sitecustomize and pins JAX_PLATFORMS=axon, so the platform must be overridden
through jax.config *after* import, and XLA_FLAGS before first backend use.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() >= 8, (
    f"expected >=8 virtual CPU devices for sharding tests, got "
    f"{jax.device_count()}"
)

"""Test configuration: run the suite on a virtual 8-device CPU mesh with
float64 enabled (the parity path). The real-TPU bench path is exercised by
bench.py, not the test suite."""

import os

# Must be set before jax is imported anywhere. Force CPU even if the
# environment preselects a TPU platform: tests are the f64 parity path.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The environment's sitecustomize registers a TPU (axon) PJRT plugin and
# force-selects it via the jax_platforms flag; pin the suite back to CPU.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process launchers)")

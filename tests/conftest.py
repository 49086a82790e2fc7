"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Parity mode: the CPU test suite runs in float64 so vectorized device code
# can be compared against exact scalar/NumPy oracles at tight tolerances.
# Set both the env var and the config flag — a pytest plugin may have
# imported jax before this conftest runs.
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

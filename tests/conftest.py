"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os

# LETF_TPU_HW=1 runs the suite against the real accelerator (f32, no CPU
# pin) so the hardware-gated tests (slab parity, Pallas-vs-XLA) actually
# execute; everything else skips or loosens via the same platform checks.
_HW = os.environ.get("LETF_TPU_HW") == "1"

if not _HW:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # Parity mode: the CPU test suite runs in float64 so vectorized device
    # code can be compared against exact scalar/NumPy oracles at tight
    # tolerances. Set both the env var and the config flag — a pytest
    # plugin may have imported jax before this conftest runs.
    os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

if not _HW:
    # The environment force-registers the axon TPU plugin (JAX_PLATFORMS=
    # axon is re-applied after our env var), so pin the platform via config
    # — the env var alone is NOT sufficient here. Everything below must run
    # on host CPU: the virtual 8-device mesh and exact-f64 parity both
    # require it.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: amortize scan compiles across test runs.
# Separate dir from the TPU sessions' cache: concurrent writers (a pytest
# run alongside a TPU bench) can truncate entries, and a corrupt entry
# segfaults jax on the next cache READ — keep the blast radii apart.
_CACHE_DIR = ("/tmp/letf_tpu_jax_cache" if _HW
              else "/tmp/letf_tpu_jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Release JIT code mappings between modules. Every compiled XLA:CPU
# executable holds ~9 small anonymous mappings (4-16 KB LLVM code pages);
# a full-suite process accumulates 45k+ mappings and the next LARGE
# compile/deserialize (the [B=3] vmapped path-engine fixture, ~96 tests
# in) blows vm.max_map_count (65530) — mmap fails and XLA segfaults
# (deterministic at that test in a full run, unreproducible in any
# subset; maps counted via /proc/self/maps). clear_caches() + gc drops
# dead executables and returns the count to baseline; the persistent
# compile cache makes the cross-module recompiles cheap.


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_jit_map_pressure():
    yield
    jax.clear_caches()
    gc.collect()

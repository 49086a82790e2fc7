"""Measure the 1M x 30y full-engine run through the resident driver."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.parallel.mc_runner import run_monte_carlo

model = default_sim_model()
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N = int(sys.argv[3]) if len(sys.argv) > 3 else 1_048_576

# Warm the resident executable with one superchunk-sized run.
t0 = time.perf_counter()
run_monte_carlo(model, 30, num_simulations=2 * B, seed=2, chunk_size=B,
                progress=False, chunks_per_dispatch=2)
print(f"warm (2 chunks incl. compile): {time.perf_counter() - t0:.1f} s",
      flush=True)
# K-superchunk executable.
t0 = time.perf_counter()
run_monte_carlo(model, 30, num_simulations=K * B, seed=2, chunk_size=B,
                progress=False, chunks_per_dispatch=K)
print(f"warm (K={K} incl. compile): {time.perf_counter() - t0:.1f} s",
      flush=True)

t0 = time.perf_counter()
arr = run_monte_carlo(model, 30, num_simulations=N, seed=2, chunk_size=B,
                      progress=False, chunks_per_dispatch=K)
dt = time.perf_counter() - t0
pd = N * 7560 / dt
print(f"1M x 30y measured: {dt:.1f} s  ({pd / 1e6:.0f}M path-days/s)  "
      f"p50_tqqq={float(np.median(arr.final_wealth[:, 0])):.1f}", flush=True)

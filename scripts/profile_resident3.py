"""Same-process calibration: direct slab chunk vs resident scan vs 1M run."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops.slab_chunk import slab_chunk_summaries
from letf_tpu.parallel.mc_runner import _resident_superchunk, run_monte_carlo
from letf_tpu.parallel.mesh import trial_mesh

model = jax.tree.map(jnp.asarray, default_sim_model())
B, K = 16384, 16
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


@jax.jit
def direct(key):
    s = slab_chunk_summaries(model, key, ids, anti, sim_days=7560,
                             buffer_days=1260, random_start_method="offset")
    return jnp.sum(s["final_wealth"])


print("compiling direct...", flush=True)
float(direct(jax.random.key(0)))
for i in range(3):
    t0 = time.perf_counter()
    float(direct(jax.random.key(i + 1)))
    print(f"direct chunk: {time.perf_counter() - t0:.3f} s", flush=True)

mesh = trial_mesh()
fn = _resident_superchunk(mesh, K, B, 7560, 1260, "offset", True, True,
                          "institutional_v1", True)
print("compiling resident...", flush=True)
s = fn(model, jax.random.key(2), jnp.int32(0), None, None, None)
_ = float(jnp.sum(s["final_wealth"]))
for i in range(2):
    t0 = time.perf_counter()
    s = fn(model, jax.random.key(2), jnp.int32(i * K * B), None, None, None)
    x = float(jnp.sum(s["final_wealth"]))
    dt = time.perf_counter() - t0
    print(f"resident K={K}: {dt:.2f} s ({dt / K * 1e3:.0f} ms/chunk)",
          flush=True)

# fetch-only timing for one resident group
s = fn(model, jax.random.key(2), jnp.int32(0), None, None, None)
_ = float(jnp.sum(s["final_wealth"]))
t0 = time.perf_counter()
host = {k: np.asarray(v) for k, v in s.items()}
dt = time.perf_counter() - t0
nb = sum(v.nbytes for v in host.values())
print(f"fetch only: {dt:.2f} s ({nb / 1e6:.0f} MB -> {nb / 1e6 / dt:.0f} "
      f"MB/s)", flush=True)

t0 = time.perf_counter()
arr = run_monte_carlo(model, 30, num_simulations=1_048_576, seed=2,
                      chunk_size=B, progress=False, chunks_per_dispatch=K)
dt = time.perf_counter() - t0
print(f"1M x 30y measured: {dt:.1f} s "
      f"({1_048_576 * 7560 / dt / 1e6:.0f}M pd/s)", flush=True)

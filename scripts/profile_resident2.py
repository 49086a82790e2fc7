"""Decompose resident-run overhead: scan compute vs host fetch."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.parallel.mc_runner import _resident_superchunk
from letf_tpu.parallel.mesh import trial_mesh

model = jax.tree.map(jnp.asarray, default_sim_model())
B, K = 16384, 16
mesh = trial_mesh()
fn = _resident_superchunk(mesh, K, B, 7560, 1260, "offset", True, True,
                          "institutional_v1", True)
key = jax.random.key(2)

# compile + warm
s = fn(model, key, jnp.int32(0), None, None, None)
_ = float(jnp.sum(s["final_wealth"]))

# scalar-forced compute only (one K=16 dispatch)
t0 = time.perf_counter()
s = fn(model, key, jnp.int32(0), None, None, None)
x = float(jnp.sum(s["final_wealth"]))
dt = time.perf_counter() - t0
print(f"K=16 dispatch + scalar fetch: {dt:.2f} s "
      f"({B*K*7560/dt/1e6:.0f}M pd/s)", flush=True)

# full fetch of all 11 summary keys for one dispatch
t0 = time.perf_counter()
s = fn(model, key, jnp.int32(0), None, None, None)
host = {k: np.asarray(v) for k, v in s.items()}
dt = time.perf_counter() - t0
nbytes = sum(v.nbytes for v in host.values())
print(f"K=16 dispatch + full fetch: {dt:.2f} s ({nbytes/1e6:.0f} MB)",
      flush=True)

# fetch-only (arrays already computed? recompute then time just transfer)
s = fn(model, key, jnp.int32(0), None, None, None)
_ = float(jnp.sum(s["final_wealth"]))   # force completion
t0 = time.perf_counter()
host = {k: np.asarray(v) for k, v in s.items()}
dt = time.perf_counter() - t0
print(f"fetch only: {dt:.2f} s ({nbytes/1e6:.0f} MB -> "
      f"{nbytes/1e6/dt:.0f} MB/s)", flush=True)

import time, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from letf_tpu.utils.backend import ensure_backend
print("platform:", ensure_backend(), flush=True)
from letf_tpu.models.params import default_sim_model
from letf_tpu.ops.path_batched import plan_max_spells
from letf_tpu.parallel.mc_runner import _mc_chunk

model = default_sim_model()
B, years = 8192, 30
sim_days, buffer_days = years*252, 1260
ids = jnp.arange(B, dtype=jnp.int32)//2
anti = (jnp.arange(B)%2).astype(bool)
ms = plan_max_spells(model, sim_days+buffer_days)

@jax.jit
def chunk_scalar(k):
    s,_ = _mc_chunk(model, k, ids, anti, sim_days, buffer_days,
                    random_start_method="offset", apply_costs=True, max_spells=ms)
    return jnp.sum(s["final_wealth"])

t0=time.perf_counter(); float(chunk_scalar(jax.random.key(0)))
print("compile+run1:", round(time.perf_counter()-t0,1), "s", flush=True)
ts=[]
for r in range(3):
    t0=time.perf_counter(); float(chunk_scalar(jax.random.key(r+1))); ts.append(time.perf_counter()-t0)
print(json.dumps({"b30y_seconds_per_chunk": [round(t,4) for t in ts],
                  "path_days_per_sec": round(B*7560/min(ts),1),
                  "extrap_1M_seconds": round(min(ts)*(1048576/B),1)}), flush=True)

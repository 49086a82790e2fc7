import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from letf_tpu.models.params import default_sim_model
from letf_tpu.reporting import exact_post_tax_all_trials

model = default_sim_model()
B = 2048
t0 = time.perf_counter()
out = exact_post_tax_all_trials(model, 30, B, chunk_size=B, seed=3)
print(f"warm 2048x30y x13 (incl compile): {time.perf_counter()-t0:.1f} s",
      flush=True)
t0 = time.perf_counter()
out = exact_post_tax_all_trials(model, 30, B, chunk_size=B, seed=4)
dt = time.perf_counter() - t0
print(f"exact tax 2048 x 30y x 13 strategies: {dt:.1f} s "
      f"-> 1M extrapolated {dt * 512 / 60:.1f} min", flush=True)
print("S7 median_tax:", round(out["S7"]["median_tax"], 1), flush=True)

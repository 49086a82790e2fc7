import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import bench
t0 = time.perf_counter()
out = bench.bench_distribution("tpu")
print(f"dist block: {time.perf_counter()-t0:.1f} s", flush=True)
print(json.dumps(out, indent=1), flush=True)

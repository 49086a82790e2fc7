"""Measure the production report path: 1M x 30y full percentile report."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from letf_tpu.models.params import default_sim_model
from letf_tpu.parallel.mc_runner import monte_carlo_report

model = default_sim_model()
t0 = time.perf_counter()
monte_carlo_report(model, 30, num_simulations=1_048_576, seed=2,
                   chunk_size=16384, chunks_per_dispatch=16)
print(f"warm (incl compile): {time.perf_counter()-t0:.1f} s", flush=True)
for cpd in (16, 16, 32, 64):
    t0 = time.perf_counter()
    rep = monte_carlo_report(model, 30, num_simulations=1_048_576, seed=2,
                             chunk_size=16384, chunks_per_dispatch=cpd)
    dt = time.perf_counter() - t0
    print(f"1M x 30y report (cpd={cpd}): {dt:.1f} s "
          f"({1_048_576*7560/dt/1e6:.0f}M pd/s)", flush=True)
s1 = rep["strategies"]["S1"]
print("S1 p50 wealth:", round(s1["wealth"]["p50"], 2),
      "p90 cagr:", round(s1["cagr"]["p90"], 4),
      "ruin:", round(s1["ruin_frac"], 4), flush=True)

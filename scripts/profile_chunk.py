"""Stage-level timing of the production chunk on the current backend.

Times (a) path generation alone, (b) +signals, (c) full chunk
(+strategies), so the remaining optimization target is unambiguous.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops.path_batched import generate_paths_batched
from letf_tpu.strategies.engine import run_strategies_batch
from letf_tpu.strategies.signals import compute_signals

B, years = 16384, 10
sim_days, buffer_days = years * 252, 1260
model = default_sim_model()
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


@jax.jit
def paths_only(key):
    p = generate_paths_batched(model, key, ids, anti, sim_days=sim_days,
                               buffer_days=buffer_days,
                               random_start_method="offset")
    return jnp.sum(p.etf_ret[:, -1, :])


@jax.jit
def paths_sig(key):
    p = generate_paths_batched(model, key, ids, anti, sim_days=sim_days,
                               buffer_days=buffer_days,
                               random_start_method="offset")
    s = compute_signals(p)
    return jnp.sum(s.spy_sma200[:, -1]) + jnp.sum(p.etf_ret[:, -1, :])


@jax.jit
def full(key):
    p = generate_paths_batched(model, key, ids, anti, sim_days=sim_days,
                               buffer_days=buffer_days,
                               random_start_method="offset")
    s = compute_signals(p)
    r = run_strategies_batch(p, s, apply_costs=True)
    return jnp.sum(r.final_wealth)


def t(fn, label, n=3):
    out = float(fn(jax.random.key(0)))  # compile + sanity fetch
    t0 = time.perf_counter()
    for i in range(n):
        out = float(fn(jax.random.key(i + 1)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:16s} {dt * 1e3:9.1f} ms   ({B * sim_days / dt / 1e6:8.1f}M path-days/s)")
    return dt


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}  B={B}  years={years}")
    d1 = t(paths_only, "paths")
    d2 = t(paths_sig, "paths+signals")
    d3 = t(full, "full chunk")
    print(f"signals ~= {(d2 - d1) * 1e3:.1f} ms, strategies ~= {(d3 - d2) * 1e3:.1f} ms")

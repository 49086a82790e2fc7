"""Time the Pallas strategy kernel at different tile heights vs the scan."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops.pallas_strategies import channels_from, pallas_strategies_run
from letf_tpu.ops.path_batched import generate_paths_batched
from letf_tpu.strategies.engine import run_strategies_batch
from letf_tpu.strategies.signals import compute_signals

B, years = 16384, 10
S, buf = years * 252, 1260
model = default_sim_model()
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


@jax.jit
def gen(key):
    p = generate_paths_batched(model, key, ids, anti, sim_days=S,
                               buffer_days=buf, random_start_method="offset")
    return p, compute_signals(p)


@functools.partial(jax.jit, static_argnames=("sub", "day_block"))
def kern(key, sub, day_block):
    p, sig = gen(key)
    fw, _, _ = pallas_strategies_run(channels_from(p, sig), sub=sub,
                                     day_block=day_block)
    return jnp.sum(fw)


@jax.jit
def scan(key):
    p, sig = gen(key)
    r = run_strategies_batch(p, sig, strategy_kernel="off")
    return jnp.sum(r.final_wealth)


@jax.jit
def gen_only(key):
    p, sig = gen(key)
    return jnp.sum(p.etf_ret[:, -1, :]) + jnp.sum(sig.spy_rsi14[:, -1])


def t(fn, label, n=3):
    fn(jax.random.key(0))
    t0 = time.perf_counter()
    for i in range(n):
        float(fn(jax.random.key(i + 1)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:28s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


if __name__ == "__main__":
    base = t(lambda k: float(gen_only(k)), "paths+signals only")
    for sub in (8, 16, 32):
        for db in (8, 32):
            d = t(lambda k: float(kern(k, sub, db)),
                  f"kernel sub={sub} day_block={db}")
            print(f"    -> strategy stage ~{(d - base) * 1e3:.1f} ms",
                  flush=True)

"""Sensitivity probe: how much of the fused compose+strategies kernel's
time is murmur mixing? Times the kernel (a) as shipped, (b) with _mix
monkeypatched to a single xorshift (NOT statistically valid — probe only).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import pallas_joint as pj
from letf_tpu.ops.path_engine import _to_device

CHEAP = os.environ.get("CHEAP_MIX", "0") == "1"
if CHEAP:
    def _cheap(x):
        return (x ^ (x >> 13)) * pj._M1
    pj._mix = _cheap
    import letf_tpu.ops.pallas_compose as pc
    pc._mix = _cheap

from letf_tpu.ops.pallas_compose import _pack_asset_params, _pack_stress_params
from letf_tpu.ops.pallas_strategies import pallas_compose_strategies_run

B, SIM, K = 16384, 7560, 8
sub = 8
G = B // (sub * 128)
model = _to_device(jax.tree.map(jnp.asarray, default_sim_model()))
sp = _pack_stress_params(model)
ap = _pack_asset_params(model)
seed_words = jnp.asarray([3, 9], jnp.int32)


@jax.jit
def run(seed):
    def body(acc, ci):
        base = ci.astype(jnp.float32) * 1e-7
        mk = lambda v: jnp.full((G, SIM, sub, 128), v, jnp.float32) + base
        spy, qqq, tlt = mk(0.0004), mk(0.0005), mk(0.0001)
        vix, irx, regime = mk(19.0), mk(4.2), jnp.zeros(
            (G, SIM, sub, 128), jnp.float32)
        spy = jax.lax.optimization_barrier(spy)
        ids = ci * B + jnp.arange(B, dtype=jnp.int32)
        fw = pallas_compose_strategies_run(
            sp, ap, ids, seed_words, spy, qqq, tlt, vix, irx, regime,
            sim_days=SIM, cashflows=None, apply_costs=True)[0]
        return acc + jnp.sum(fw[:, 0]), ()
    acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                          jnp.arange(K, dtype=jnp.int32))
    return acc


float(run(jnp.int32(0)))
best = 1e9
for i in range(2):
    t0 = time.perf_counter()
    float(run(jnp.int32(i)))
    best = min(best, time.perf_counter() - t0)
print(f"compose+strategies ({'cheap mix' if CHEAP else 'shipped'}): "
      f"{best / K * 1e3:.1f} ms/chunk", flush=True)

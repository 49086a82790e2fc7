"""Stage profile of the exact-tax path (stable jit wrappers, timed twice)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
from letf_tpu.models.params import default_sim_model
from letf_tpu.parallel.mc_runner import _mc_chunk, _trial_layout
from letf_tpu.tax import device_bridge as db

model = default_sim_model()
B, years = 4096, 30
S = years * 252
ids, anti = _trial_layout(B, True)
key = jax.random.key(3)

_, emission = _mc_chunk(model, key, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(anti), S, 1260,
                        random_start_method="offset", apply_costs=True,
                        emit_trades=True)
tj = [e[:, :, 0] for e in emission]
tr = jax.jit(db.replay_trades)(*tj)
bq = tr["buy_sh"][..., 0]; sm = tr["sell_sh"][..., 0]; price = tr["price"]

def p1(bq, sm, price):
    cb = jnp.cumsum(bq, axis=1); cb_prev = cb - bq
    take = jnp.minimum(sm, cb[:, -1:])
    cost1 = db._prefix_cost(take, cb_prev, bq, price)
    gl1 = sm * price - cost1
    return jnp.where((sm > 0) & (gl1 < 0), -gl1, 0.0)

def p2(bq, sm, price):
    cb = jnp.cumsum(bq, axis=1); cb_prev = cb - bq
    cs = jnp.cumsum(sm, axis=1); cs_prev = cs - sm
    orig = jnp.broadcast_to(jnp.arange(S)[None, :], bq.shape)
    anybuy = jnp.zeros(bq.shape, bool)
    return db._fifo_year_buckets(cs, cs_prev, price, cb, cb_prev, bq,
                                 price, orig, anybuy, years)

def p2_merge(bq, sm, price):
    cb = jnp.cumsum(bq, axis=1); cb_prev = cb - bq
    cs = jnp.cumsum(sm, axis=1); cs_prev = cs - sm
    orig = jnp.broadcast_to(jnp.arange(S)[None, :], bq.shape)
    anybuy = jnp.zeros(bq.shape, bool)
    return db._fifo_year_buckets_merge(cs, cs_prev, price, cb, cb_prev,
                                       bq, price, orig, anybuy, years)

from letf_tpu.ops.pallas_wash import wash_matching_pallas

j_p1 = jax.jit(p1)
j_wash = jax.jit(db._wash_matching_scan)
j_washk = jax.jit(wash_matching_pallas)
j_p2 = jax.jit(p2)
j_p2m = jax.jit(p2_merge)
j_full = jax.jit(lambda a, b, c, d: db.yearly_activity_from_emission(
    a, b, c, d, n_years=years))
j_replay = jax.jit(db.replay_trades)

loss1 = j_p1(bq, sm, price)
np.asarray(loss1)

for label, fn, args in (
        ("replay", j_replay, tj),
        ("pass1", j_p1, (bq, sm, price)),
        ("wash", j_wash, (loss1, sm, bq)),
        ("wash_pallas", j_washk, (loss1, sm, bq)),
        ("pass2_banded", j_p2, (bq, sm, price)),
        ("pass2_merge", j_p2m, (bq, sm, price)),
        ("full", j_full, tj)):
    out = fn(*args)
    jax.tree.map(np.asarray, out)     # compile + drain
    for rep in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(np.asarray, out)
        print(f"{label} run{rep}: {time.perf_counter()-t0:.2f} s",
              flush=True)

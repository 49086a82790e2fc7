"""Bridge-internal stage profile at the production group shape
([B*G, S] rows): replay scan, pass-1 prefix cost, wash matching,
pass-2 merge — which of the bridge's stages carries the 2.37 s/group?

Usage: python scripts/tpu_bridge_stage_profile.py [rows] [years]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.tax import device_bridge as db  # noqa: E402

R = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
H = int(sys.argv[2]) if len(sys.argv) > 2 else 30
S = H * 252

rng = np.random.default_rng(0)
# Synthetic but realistically-shaped trades: ~weekly rebalances.
do = rng.random((R, S)) < 0.2
price = np.cumprod(1 + rng.normal(0, 0.03, (R, S)).astype(np.float32),
                   axis=1).astype(np.float32) * 50
alloc = np.where(do, rng.random((R, S)).astype(np.float32), np.nan)
value = (10000 * np.cumprod(1 + rng.normal(0, 0.01, (R, S)),
                            axis=1)).astype(np.float32)
asset = np.zeros((R, S), np.int8)

tj_alloc = jnp.asarray(alloc.T)
tj_value = jnp.asarray(value.T)
tj_price = jnp.asarray(price.T)
tj_asset = jnp.asarray(asset.T)


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def stage(label, fn, reps=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:<34s} {dt * 1000:8.1f} ms")
    return dt


print(f"bridge stages: rows={R}, S={S}")

replay = jax.jit(db.replay_trades)
tr = replay(tj_alloc, tj_value, tj_price, tj_asset)
stage("replay scan", lambda: fetch(replay(
    tj_alloc, tj_value, tj_price, tj_asset)["buy_sh"]))

buy_q = tr["buy_sh"][..., 0]
sell_m = tr["sell_sh"][..., 0]
pr = tr["price"]

cb = jnp.cumsum(buy_q, axis=1)
cb_prev = cb - buy_q
total = cb[:, -1:]
take = jnp.minimum(sell_m, total)

pc = jax.jit(db._prefix_cost)
stage("pass1 prefix cost (merged sort)", lambda: fetch(
    pc(take, cb_prev, buy_q, pr)))
cost1 = pc(take, cb_prev, buy_q, pr)
gl1 = sell_m * pr - cost1
loss1 = jnp.where((sell_m > 0) & (gl1 < 0), -gl1, 0.0)

wm = jax.jit(db._wash_matching)
stage("wash matching (pallas)", lambda: fetch(
    wm(loss1, sell_m, buy_q)[0]))

ya = jax.jit(db._asset_yearly_activity, static_argnames=("n_years",
                                                         "method"))
stage("FULL asset activity (1 asset)", lambda: fetch(
    ya(buy_q, sell_m, pr, n_years=H)))

"""Compute-honest stage profile of the exact-tax bridge.

The r3 profile (tpu_tax_profile.py) fetched full [B, S] outputs through
the ~18 MB/s tunnel, so stage times were fetch-dominated (replay
"29.5 s" = a 620 MB fetch). Here every stage reduces to a scalar on
device; only that scalar crosses the tunnel.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model  # noqa: E402
from letf_tpu.parallel.mc_runner import _mc_chunk, _trial_layout  # noqa: E402
from letf_tpu.tax import device_bridge as db  # noqa: E402

model = default_sim_model()
B, years = 4096, 30
S = years * 252
ids, anti = _trial_layout(B, True)
key = jax.random.key(3)

_, emission = _mc_chunk(model, key, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(anti), S, 1260,
                        random_start_method="offset", apply_costs=True,
                        emit_trades=True)
tj = [e[:, :, 0] for e in emission]                    # strategy col 0 (S7)
tr = jax.jit(db.replay_trades)(*tj)
bq = tr["buy_sh"][..., 0]
sm = tr["sell_sh"][..., 0]
price = tr["price"]
jax.block_until_ready(tr)
np.asarray(bq[:, -1])
print(f"platform={jax.devices()[0].platform}  B={B}  {years}y", flush=True)


def J(fn):
    return jax.jit(lambda *a: jax.tree.map(jnp.sum, fn(*a)))


def s_replay(a, b, c, d):
    t = db.replay_trades(a, b, c, d)
    return t["buy_sh"].sum() + t["sell_sh"].sum()


def mk_pass1(bq, sm, price):
    cb = jnp.cumsum(bq, axis=1)
    cb_prev = cb - bq
    take = jnp.minimum(sm, cb[:, -1:])
    cost1 = db._prefix_cost(take, cb_prev, bq, price)
    gl1 = sm * price - cost1
    return jnp.where((sm > 0) & (gl1 < 0), -gl1, 0.0)


def s_pass1(bq, sm, price):
    return mk_pass1(bq, sm, price).sum()


def s_wash(loss, sm, bq):
    d, r, h = db._wash_matching(loss, sm, bq)
    return d.sum() + r.sum() + h.sum()


def s_shifts(dis, rep_off, has, bq):
    B_, S_ = dis.shape
    dt = dis.dtype
    basis_adj = jnp.zeros((B_, S_), dt)
    tacked = jnp.zeros((B_, S_), bool)
    dis_pad = jnp.pad(dis, ((0, 0), (30, 30)))
    off_pad = jnp.pad(rep_off, ((0, 0), (30, 30)), constant_values=99)
    has_pad = jnp.pad(has, ((0, 0), (30, 30)))
    for o in range(-30, 31):
        if o == 0:
            continue
        src = slice(30 - o, 30 - o + S_)
        hit = has_pad[:, src] & (off_pad[:, src] == o)
        basis_adj = basis_adj + jnp.where(hit, dis_pad[:, src], 0.0)
        tacked = tacked | hit
    anybuy = jnp.zeros((B_, S_), bool)
    qp = jnp.pad(bq, ((0, 0), (30, 30)))
    for o in range(-30, 31):
        if o == 0:
            continue
        anybuy = anybuy | (qp[:, 30 + o:30 + o + S_] > db._MIN_SHARES)
    return basis_adj.sum() + tacked.sum() + anybuy.sum()


def s_merge(bq, sm, price):
    cb = jnp.cumsum(bq, axis=1)
    cb_prev = cb - bq
    cs = jnp.cumsum(sm, axis=1)
    cs_prev = cs - sm
    orig = jnp.broadcast_to(jnp.arange(S)[None, :], bq.shape).astype(bq.dtype)
    anybuy = jnp.zeros(bq.shape, bool)
    return db._fifo_year_buckets_merge(cs, cs_prev, price, cb, cb_prev, bq,
                                       price, orig, anybuy, years).sum()


def s_asset(bq, sm, price):
    return db._asset_yearly_activity(bq, sm, price, years).sum()


def s_full(a, b, c, d):
    act, nt = db.yearly_activity_from_emission(a, b, c, d, n_years=years)
    return act.sum() + nt.sum()


loss1 = jax.jit(mk_pass1)(bq, sm, price)
dis, rep_off, has = jax.jit(db._wash_matching)(loss1, sm, bq)
jax.block_until_ready((loss1, dis))

for label, fn, args in (
        ("replay", jax.jit(s_replay), tj),
        ("pass1(prefix+sort)", jax.jit(s_pass1), (bq, sm, price)),
        ("wash(kernel)", jax.jit(s_wash), (loss1, sm, bq)),
        ("shift-unload+anybuy", jax.jit(s_shifts), (dis, rep_off, has, bq)),
        ("pass2-merge", jax.jit(s_merge), (bq, sm, price)),
        ("asset-total", jax.jit(s_asset), (bq, sm, price)),
        ("full-strategy-col", jax.jit(s_full), tj)):
    r = fn(*args)
    float(r)                                   # compile + drain
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:22s}: {best:6.3f} s", flush=True)

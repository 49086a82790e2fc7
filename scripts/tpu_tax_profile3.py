"""Round-4 exact-tax stage profile: where does a 2048x30y all-13 chunk
spend its time after the r3 merged-sort bridge?

Stages (all timed with a scalar host fetch per stage — block_until_ready
does not synchronize through the tunnel):
  1. emission: _mc_chunk(emit_trades=True) — paths + signals + strategies
     + journal emission through the non-slab engine
  2. bridge: grouped yearly_activity_from_emission (replay scan, pass-1
     merged prefix cost, Pallas wash, pass-2 merge) per strategy group
  3. netting: total_tax_all_trials over [B*G, Y, 4]

Usage: python scripts/tpu_tax_profile3.py [B]   (default 2048)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu import config as cfg  # noqa: E402
from letf_tpu.income import simulate_wired_income_path  # noqa: E402
from letf_tpu.models.params import default_sim_model  # noqa: E402
from letf_tpu.parallel.mc_runner import _mc_chunk, _trial_layout  # noqa: E402
from letf_tpu.tax.device_bridge import yearly_activity_from_emission  # noqa: E402
from letf_tpu.tax.vectorized import total_tax_all_trials  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
H = 30
sim_days = H * cfg.TRADING_DAYS
buffer_days = int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
model = default_sim_model()
ids, anti = _trial_layout(B, cfg.USE_ANTITHETIC_VARIATES)
key = jax.random.key(4)
income = jnp.asarray(simulate_wired_income_path(150000, H, seed=42))

strategy_ids = list(cfg.TAXABLE_IDS)
cols = list(range(len(strategy_ids)))
# PRODUCTION grouping (reporting.exact_post_tax_all_trials): on TPU/f32
# with the Pallas merges inlined the fold caps at 2048 rows — the 8192-row
# fold OOM-kills the remote compile helper (observed again 2026-08-20).
from letf_tpu.tax.device_bridge import _use_pallas_sort  # noqa: E402

fold_cap = 2048 if _use_pallas_sort(jnp.float32) else 8192
gsz = max(1, fold_cap // B)
pairs = [(s, c) for s, c in zip(strategy_ids, cols) if s != "S8"]
groups = [pairs[g0:g0 + gsz] for g0 in range(0, len(pairs), gsz)]
groups.append([(s, c) for s, c in zip(strategy_ids, cols) if s == "S8"])


def fetch(x):
    return float(np.asarray(jnp.sum(jnp.asarray(
        x if not isinstance(x, tuple) else x[0]))))


def stage(label, fn, reps=2):
    fn()                      # warm/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"  {label:<28s} {dt * 1000:8.1f} ms")
    return dt


print(f"profile: B={B} x {H}y x {len(strategy_ids)} strategies "
      f"({len(groups)} bridge groups of <= {gsz})")

# 1. emission
def run_emission():
    s, e = _mc_chunk(model, key, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(anti), sim_days, buffer_days,
                     random_start_method="offset", apply_costs=True,
                     emit_trades=True)
    fetch(e[0])
    return s, e

t_em = stage("emission (non-slab engine)", run_emission)
summaries, emission = run_emission()
S_e = emission[0].shape[0]

# also: the same chunk WITHOUT emission through the slab engine, for the
# emission-overhead split
def run_slab():
    s, _ = _mc_chunk(model, key, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(anti), sim_days, buffer_days,
                     random_start_method="offset", apply_costs=True,
                     emit_trades=False)
    fetch(s["final_wealth"])

t_slab = stage("same chunk, slab, no emission", run_slab)

# 2. bridge per group (stack + drop per group — holding every group's
# stacked emission + activity live OOMed a 16 GB chip)
t_bridge = 0.0
last_act = None
from letf_tpu.tax.device_bridge import yearly_activity_staged  # noqa: E402

for grp in groups:
    gcols = jnp.asarray([c for _, c in grp])
    stacked = tuple(jnp.reshape(e[:, :, gcols], (S_e, B * len(grp)))
                    for e in emission)
    names = "+".join(s for s, _ in grp)
    g_assets = (0, 1) if "S8" in [s for s, _ in grp] else (0,)
    def run_bridge(stacked=stacked, g_assets=g_assets):
        if fold_cap == 2048:
            a, nt, _sk = yearly_activity_staged(*stacked, n_years=H,
                                                assets=g_assets)
        else:
            a, nt, _sk = yearly_activity_from_emission(
                *stacked, n_years=H, assets=g_assets)
        fetch(a)
        return a, nt
    t_bridge += stage(f"bridge [{names}]", run_bridge)
    if last_act is not None:
        del last_act
    last_act = run_bridge()
    del stacked

# 3. netting (timed on the last group, scaled to all groups)
a, nt = last_act
def run_tax():
    tax = total_tax_all_trials(a[..., :4], income, cfg.INITIAL_CAPITAL,
                               nt.astype(a.dtype) / H)
    return fetch(tax["total_tax"])

t_tax = stage("netting+brackets (1 group)", run_tax) * len(groups)

total = t_em + t_bridge + t_tax
print(f"  {'TOTAL (emission+bridge+tax)':<28s} {total * 1000:8.1f} ms")
print(f"  emission overhead vs slab: {(t_em - t_slab) * 1000:.1f} ms")
print(f"  extrapolated 1M: {total * 1_048_576 / B / 60:.1f} min")

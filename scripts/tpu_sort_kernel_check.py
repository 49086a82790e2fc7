"""A/B check of the Pallas bitonic sort networks on real TPU hardware.

1. Parity: yearly_activity_from_emission on a real emission chunk must
   be BITWISE equal between the Pallas-sort path and the lax.sort path
   (device_bridge._FORCE_LAX_SORT monkeypatch; jax.clear_caches between
   runs so the flag re-traces).
2. Timing: per-column bridge cost both ways at the production shape.

Usage: python scripts/tpu_sort_kernel_check.py [B] [H]  (default 512 30
for parity; timing always runs at 2048 x 30y on the S7 column)
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
from letf_tpu.models.params import default_sim_model  # noqa: E402
from letf_tpu.parallel.mc_runner import _mc_chunk, _trial_layout  # noqa: E402
from letf_tpu.tax import device_bridge as db  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
H = int(sys.argv[2]) if len(sys.argv) > 2 else 30
sim_days = H * cfg.TRADING_DAYS
buffer_days = int(cfg.RANDOM_START_BUFFER_YEARS * cfg.TRADING_DAYS)
model = default_sim_model()
ids, anti = _trial_layout(B, cfg.USE_ANTITHETIC_VARIATES)
key = jax.random.key(4)

print(f"emission: B={B} x {H}y")
_, emission = _mc_chunk(model, key, jnp.asarray(ids, jnp.int32),
                        jnp.asarray(anti), sim_days, buffer_days,
                        random_start_method="offset", apply_costs=True,
                        emit_trades=True)
S_e = emission[0].shape[0]
strategy_ids = list(cfg.TAXABLE_IDS)


def run_col(c):
    col = tuple(e[:, :, c] for e in emission)
    a, nt = db.yearly_activity_from_emission(*col, n_years=H)
    return np.asarray(a), np.asarray(nt)


# ---- parity: every taxable column, both paths, bitwise ----
cols = range(len(strategy_ids))
got_pallas = [run_col(c) for c in cols]
db._FORCE_LAX_SORT = True
jax.clear_caches()
got_lax = [run_col(c) for c in cols]
db._FORCE_LAX_SORT = False
jax.clear_caches()

worst = 0.0
n_diff = 0
for sid, (gp, gl) in zip(strategy_ids, zip(got_pallas, got_lax)):
    eq = np.array_equal(gp[0], gl[0]) and np.array_equal(gp[1], gl[1])
    if not eq:
        d = np.max(np.abs(gp[0] - gl[0]))
        worst = max(worst, float(d))
        n_diff += 1
        print(f"  {sid}: DIFF max|d|={d:.3e}")
print(f"parity: {len(strategy_ids) - n_diff}/{len(strategy_ids)} columns "
      f"bitwise equal" + (f" (worst {worst:.3e})" if n_diff else ""))

# ---- timing at the production shape ----
Bt = 2048
if B != Bt:
    ids, anti = _trial_layout(Bt, cfg.USE_ANTITHETIC_VARIATES)
    _, emission = _mc_chunk(model, key, jnp.asarray(ids, jnp.int32),
                            jnp.asarray(anti), sim_days, buffer_days,
                            random_start_method="offset",
                            apply_costs=True, emit_trades=True)

col = tuple(e[:, :, 0] for e in emission)     # S7


def timed(label):
    def run():
        a, _ = db.yearly_activity_from_emission(*col, n_years=H)
        return float(np.asarray(jnp.sum(a)))
    run()
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    print(f"  {label:<24s} {dt * 1000:8.1f} ms/column")
    return dt


t_p = timed("bridge (pallas sorts)")
db._FORCE_LAX_SORT = True
jax.clear_caches()
t_l = timed("bridge (lax.sort)")
print(f"  speedup: {t_l / t_p:.2f}x")

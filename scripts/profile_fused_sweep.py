"""Isolate the fused compose+strategies kernel: time it alone on
synthetic windowed slabs at 16384 x 30y across (sub, day_block cap,
hoisted draws on/off). Separates VPU-op effects (hoist) from geometry
effects (day_block/program count) that whole-chunk timings conflate.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from letf_tpu.models.params import default_sim_model  # noqa: E402
from letf_tpu.ops import pallas_strategies as ps  # noqa: E402
from letf_tpu.ops.pallas_compose import (  # noqa: E402
    _pack_asset_params,
    _pack_stress_params,
)
from letf_tpu.ops.path_engine import _to_device  # noqa: E402

B, S = 16384, 7560
model = _to_device(jax.tree.map(jnp.asarray, default_sim_model()))
sp = _pack_stress_params(model)
ap = _pack_asset_params(model)
ids = jnp.arange(B, dtype=jnp.int32) // 2
seed = jnp.asarray([9, 11], jnp.int32)

print(f"platform={jax.devices()[0].platform}  B={B}  S={S} (fused kernel "
      f"only)", flush=True)

key = jax.random.key(0)


def inputs(sub):
    G = B // (sub * 128)
    k1, k2 = jax.random.split(key)
    spy = 0.01 * jax.random.normal(k1, (G, S, sub, 128), jnp.float32)
    qqq = 1.1 * spy
    tlt = -0.1 * spy
    vix = jnp.full((G, S, sub, 128), 22.0, jnp.float32)
    irx = jnp.full((G, S, sub, 128), 4.0, jnp.float32)
    regime = (spy > 0.005).astype(jnp.float32)
    return spy, qqq, tlt, vix, irx, regime


for sub in (8, 16, 32):
    ins = inputs(sub)
    for hoist in (False, True):
        ps._HOIST_DRAWS = hoist
        from letf_tpu.ops.pallas_strategies import _pick_day_block
        _scr = (ps.NSTATE_COMPOSE + ps._RW_X + ps._RW_SPY + ps._RW_P
                + ps._RW_S20 + 64)
        auto_db = _pick_day_block(S, 10 if hoist else 6, sub, None,
                                  scratch_rows=_scr)
        for db in sorted({auto_db, max(1, auto_db // 2), 4}):
            ps.pallas_compose_strategies_run.clear_cache()
            try:
                out = ps.pallas_compose_strategies_run(
                    sp, ap, ids, seed, *ins, sim_days=S, apply_costs=True,
                    day_block=db)
                float(jnp.sum(out[0]))
                best = 1e9
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = ps.pallas_compose_strategies_run(
                        sp, ap, ids, seed, *ins, sim_days=S,
                        apply_costs=True, day_block=db)
                    float(jnp.sum(out[0]))
                    best = min(best, time.perf_counter() - t0)
                print(f"sub={sub:2d} hoist={hoist!s:5s} db={db:3d} "
                      f"(progs={B // (sub * 128) * (S // db):5d}): "
                      f"{best * 1e3:7.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"sub={sub:2d} hoist={hoist!s:5s} db={db:3d}: "
                      f"FAILED {type(e).__name__}: {e}", flush=True)

ps._HOIST_DRAWS = True

"""Sweep the slab chunk's trial-tile height (sub) x day-block geometry.

The fused compose+strategies kernel's day loop is a serial chain of VPU
ops: taller tiles (sub=16/32) give each op more independent sub-tiles to
overlap (less per-op latency domination), but the signal rings scale
with sub (456 rows x sub x 128 x 4 B — 7.3 MB at sub=32), starving the
streamed day blocks and forcing tiny day_block (more grid programs).
This measures the real trade on hardware: full slab_chunk_summaries at
16384 x 30y for sub in {8, 16, 32}.
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
from letf_tpu.ops import slab_chunk as sc  # noqa: E402
from letf_tpu.ops.path_engine import _to_device  # noqa: E402

B, SIM, BUF = 16384, 7560, 1260
model = _to_device(jax.tree.map(jnp.asarray, default_sim_model()))
key = jax.random.key(5)
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)

print(f"platform={jax.devices()[0].platform}  B={B}  30y", flush=True)

orig = sc.slab_chunk_summaries

for sub_h in (16, 32, 64):
    # slab_chunk picks sub from B; monkeypatch the chooser via a wrapper
    # that reshapes nothing — instead call the internals with a forced
    # sub by temporarily shadowing the `next(...)` pick.
    import letf_tpu.ops.slab_chunk as mod

    src_pick = mod.slab_chunk_summaries

    def timed():
        s = orig(model, key, ids, anti, sim_days=SIM, buffer_days=BUF,
                 random_start_method="offset")
        return float(jnp.sum(s["final_wealth"]))

    # Force the sub choice by patching the generator expression's
    # candidates: easiest robust handle is an env-style module constant.
    mod._FORCE_SUB = sub_h
    # _FORCE_SUB is read at trace time; bust the jit cache so the new
    # geometry actually traces.
    orig.clear_cache()
    try:
        timed()  # compile
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            timed()
            best = min(best, time.perf_counter() - t0)
        print(f"sub={sub_h:2d}: {best * 1e3:7.1f} ms/chunk  "
              f"({B * SIM / best / 1e6:.0f}M pd/s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"sub={sub_h:2d}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        mod._FORCE_SUB = None

# _asel FMA-form experiment at the default geometry: 2 VPU ops per
# arithmetic select instead of up to 4 (~50 selects/day in the fused
# kernel). ulp-different — ships only if the win is real and parity
# gates hold.
import letf_tpu.ops.pallas_strategies as ps  # noqa: E402

ps._ASEL_FMA = True
orig.clear_cache()
try:
    s = orig(model, key, ids, anti, sim_days=SIM, buffer_days=BUF,
             random_start_method="offset")
    fw_fma = float(jnp.sum(s["final_wealth"]))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s = orig(model, key, ids, anti, sim_days=SIM, buffer_days=BUF,
                 random_start_method="offset")
        float(jnp.sum(s["final_wealth"]))
        best = min(best, time.perf_counter() - t0)
    print(f"asel-fma: {best * 1e3:7.1f} ms/chunk  (sum {fw_fma:.6g})",
          flush=True)
except Exception as e:  # noqa: BLE001
    print(f"asel-fma: FAILED {type(e).__name__}: {e}", flush=True)
finally:
    ps._ASEL_FMA = False

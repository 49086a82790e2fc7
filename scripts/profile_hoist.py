"""A/B the hoisted-draw kernels vs inline on hardware.

Measures slab_chunk_summaries at 16384 x 30y for (hoist on/off) x
(sub 8/16/32), and checks output agreement between the modes (integer
summaries must be bitwise equal; wealth to f32 ulps — XLA/Mosaic may
compile transcendentals differently at different vector shapes).
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
from letf_tpu.ops import pallas_joint as pj  # noqa: E402
from letf_tpu.ops import pallas_strategies as ps  # noqa: E402
from letf_tpu.ops import slab_chunk as sc  # noqa: E402
from letf_tpu.ops.path_engine import _to_device  # noqa: E402

B, SIM, BUF = 16384, 7560, 1260
model = _to_device(jax.tree.map(jnp.asarray, default_sim_model()))
key = jax.random.key(5)
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)

print(f"platform={jax.devices()[0].platform}  B={B}  30y", flush=True)

results = {}
for hoist in (False, True):
    pj._HOIST_DRAWS = hoist
    ps._HOIST_DRAWS = hoist
    for sub_h in (8, 16, 32):
        sc._FORCE_SUB = sub_h
        sc.slab_chunk_summaries.clear_cache()
        try:
            s = sc.slab_chunk_summaries(model, key, ids, anti,
                                        sim_days=SIM, buffer_days=BUF,
                                        random_start_method="offset")
            fw = np.asarray(s["final_wealth"])  # forces completion
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                s = sc.slab_chunk_summaries(model, key, ids, anti,
                                            sim_days=SIM, buffer_days=BUF,
                                            random_start_method="offset")
                float(jnp.sum(s["final_wealth"]))
                best = min(best, time.perf_counter() - t0)
            results[(hoist, sub_h)] = (best, fw,
                                       np.asarray(s["num_trades"]),
                                       np.asarray(s["jump_days"]))
            print(f"hoist={hoist!s:5s} sub={sub_h:2d}: {best*1e3:7.1f} "
                  f"ms/chunk ({B*SIM/best/1e6:.0f}M pd/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"hoist={hoist!s:5s} sub={sub_h:2d}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
        finally:
            sc._FORCE_SUB = None

pj._HOIST_DRAWS = True
ps._HOIST_DRAWS = True

# Agreement checks across modes at each sub.
for sub_h in (8, 16, 32):
    a = results.get((False, sub_h))
    b = results.get((True, sub_h))
    if a is None or b is None:
        continue
    _, fwa, nta, jda = a
    _, fwb, ntb, jdb = b
    print(f"sub={sub_h:2d}: trades bitwise={np.array_equal(nta, ntb)} "
          f"jumps bitwise={np.array_equal(jda, jdb)} "
          f"wealth bitwise={np.array_equal(fwa, fwb)} "
          f"max|dw|={np.abs(fwa - fwb).max():.3e}", flush=True)

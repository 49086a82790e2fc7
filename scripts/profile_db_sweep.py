"""Sweep day-block size x scoped-VMEM limit for the two hot kernels.

The Mosaic default scoped-VMEM limit (16 MB) forces tiny day blocks at
sub=32 (the fused kernel's signal rings eat the 12 MB stream budget ->
day_block ~8, ~945 grid programs per 30y chunk; the joint kernel's
conservative cap_rows -> day_block ~36, ~980 programs). v5e has 128 MB
of physical VMEM. This measures whether larger blocks (fewer programs,
bigger DMAs, full-width hoisted-draw passes) buy real time, kernel by
kernel, plus the joint kernel's _STATIC_FIRST day-0 specialization.
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
from letf_tpu.ops.pallas_compose import (  # noqa: E402
    _pack_asset_params,
    _pack_stress_params,
)
from letf_tpu.ops.pallas_joint import (  # noqa: E402
    _pack_params,
    pallas_joint_generate,
)
from letf_tpu.ops.path_engine import _to_device  # noqa: E402

B, S, T = 16384, 7560, 8820
SUB = 32
model = _to_device(jax.tree.map(jnp.asarray, default_sim_model()))
sp = _pack_stress_params(model)
ap = _pack_asset_params(model)
params = _pack_params(model)
cheb = jnp.asarray(model.joint.chi_cheb, jnp.float32)
ids = jnp.arange(B, dtype=jnp.int32) // 2
seed = jnp.asarray([9, 11], jnp.int32)
signs = jnp.where(jnp.arange(B) % 2 == 1, -1.0, 1.0).astype(jnp.float32)
key = jax.random.key(0)

print(f"platform={jax.devices()[0].platform}  B={B} S={S} sub={SUB}",
      flush=True)

G = B // (SUB * 128)
k1, _ = jax.random.split(key)
spy = 0.01 * jax.random.normal(k1, (G, S, SUB, 128), jnp.float32)
ins = (spy, 1.1 * spy, -0.1 * spy,
       jnp.full((G, S, SUB, 128), 22.0, jnp.float32),
       jnp.full((G, S, SUB, 128), 4.0, jnp.float32),
       (spy > 0.005).astype(jnp.float32))
regime = jnp.asarray(
    (np.random.default_rng(0).random((B, T)) < 0.2).astype(np.int32))


def timeit(fn):
    fn()  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def run_strat(db):
    def fn():
        out = ps.pallas_compose_strategies_run(
            sp, ap, ids, seed, *ins, sim_days=S, apply_costs=True,
            day_block=db)
        np.asarray(out[0])
    return fn


def run_joint():
    def fn():
        outs = pallas_joint_generate(params, cheb, regime, ids, signs,
                                     seed, T, layout="slab", sub=SUB)
        np.asarray(outs[0][:, -1])
    return fn


# ---- fused compose+strategies kernel ----
for db, vmem in ((None, None), (56, 64), (120, 64), (120, 100),
                 (252, 100), (504, 110)):
    ps._VMEM_MB, ps._BUDGET_MB = vmem, (vmem - 4 if vmem else 12)
    ps.pallas_compose_strategies_run.clear_cache()
    try:
        t = timeit(run_strat(db))
        print(f"strat db={db} vmem={vmem}: {t * 1e3:7.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"strat db={db} vmem={vmem}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
ps._VMEM_MB, ps._BUDGET_MB = None, 12
ps.pallas_compose_strategies_run.clear_cache()

# ---- joint kernel ----
for cap, static in ((None, False), (2560, False), (5120, False),
                    (5120, True), (None, True)):
    pj._CAP_ROWS, pj._STATIC_FIRST = cap, static
    pallas_joint_generate.clear_cache()
    try:
        t = timeit(run_joint())
        print(f"joint cap={cap} static_first={static}: {t * 1e3:7.1f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"joint cap={cap} static_first={static}: FAILED "
              f"{type(e).__name__}: {str(e)[:160]}", flush=True)
pj._CAP_ROWS, pj._STATIC_FIRST = None, False

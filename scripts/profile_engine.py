"""Stage-by-stage wall-clock profile of the full institutional engine.

Run on the real TPU:  python scripts/profile_engine.py [B] [years]

Every stage is wrapped so it returns a SCALAR (sum of outputs) — fetching a
big array through the tunneled TPU costs seconds and would swamp the
compute time. The scalar fetch forces real synchronization
(block_until_ready does not synchronize through the tunnel — CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb
from letf_tpu.parallel.mc_runner import _mc_chunk_body
from letf_tpu.strategies.engine import run_strategies_batch
from letf_tpu.strategies.signals import compute_signals

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
years = int(sys.argv[2]) if len(sys.argv) > 2 else 10
sim_days = years * 252
buffer_days = 0
print(f"platform={jax.devices()[0].platform} B={B} sim_days={sim_days}",
      flush=True)

model = default_sim_model()
key = jax.random.key(0)
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


def tree_sum(out):
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree.leaves(out):
        if jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            continue
        tot = tot + jnp.sum(leaf).astype(jnp.float32)
    return tot


def timeit(label, fn, *args, n=3, **kw):
    out = fn(*args, **kw)           # compile
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    float(out)                      # scalar fetch = true sync
    dt = (time.perf_counter() - t0) / n
    pd = B * sim_days / dt
    print(f"{label:34s} {dt*1e3:9.1f} ms   {pd/1e6:9.1f}M path-days/s",
          flush=True)


# Full fused chunk (what production runs).
timeit("FULL chunk (paths+sig+strats)", jax.jit(lambda: tree_sum(
    _mc_chunk_body(model, key, ids, anti, sim_days, buffer_days,
                   random_start_method="none", apply_costs=True)[0])))

# Stage 1: innovation draws (fast samplers).
timeit("innovations (fast draws)", jax.jit(lambda: tree_sum(
    pb.draw_innovations_fast(model, key, ids, anti, sim_days, buffer_days,
                             "none"))))

innov = jax.jit(
    lambda: pb.draw_innovations_fast(model, key, ids, anti, sim_days,
                                     buffer_days, "none"))()
jax.block_until_ready(innov)

# Innovation sub-pieces.
tks = jax.vmap(lambda t: jax.random.fold_in(key, t))(ids)
timeit("  eps normals [B,T,3]", jax.jit(lambda: tree_sum(
    jax.vmap(lambda k: jax.random.normal(k, (sim_days, 3)))(tks))))
timeit("  chi gammas [B,2,T]", jax.jit(lambda: tree_sum(
    jax.vmap(lambda k: jnp.stack([
        2.0 * jax.random.gamma(jax.random.fold_in(k, r), 4.0, (sim_days,))
        for r in range(2)]))(tks))))
timeit("  regime spell method", jax.jit(lambda: tree_sum(
    pb.simulate_regime_paths_spell(
        model, tks, jnp.zeros((B,), jnp.int32), sim_days))))
timeit("  te t-draws [B,T,6]", jax.jit(lambda: tree_sum(
    jax.vmap(lambda k: pb.t_int_df(k, 5, (sim_days, 6)))(tks))))

# Stage 2: joint + VIX scan.
timeit("joint+VIX scan", jax.jit(lambda iv: tree_sum(
    pb.simulate_joint_and_vix_batched(
        model, iv.regime_full, iv.eps, iv.u_chi, iv.vix_noise))), innov)

x, vix = jax.jit(lambda iv: pb.simulate_joint_and_vix_batched(
    model, iv.regime_full, iv.eps, iv.u_chi, iv.vix_noise))(innov)
jax.block_until_ready(vix)

# Stage 3: stress scan.
timeit("stress scan", jax.jit(lambda iv, vv: tree_sum(
    pb.simulate_stress_batched(
        model, iv.regime_full, vv, iv.stress_norms, iv.u_jump, iv.t_abs))),
    innov, vix)

# Stage 4: TE scan.
und = jnp.stack([x[..., 0]] * 6, axis=-1)
timeit("TE scan", jax.jit(lambda iv, vv, uu: tree_sum(
    pb.simulate_tracking_error_batched(
        model, iv.regime_full, vv, uu, iv.te_draws))), innov, vix, und)

# Stage 5: full path_from_innovations (all of the above + compose).
timeit("path_from_innovations (all)", jax.jit(lambda iv: tree_sum(
    pb.path_from_innovations_batched(model, iv, sim_days))), innov)

path = jax.jit(lambda iv: pb.path_from_innovations_batched(
    model, iv, sim_days))(innov)
jax.block_until_ready(path)

# Stage 6: signals.
timeit("signals", jax.jit(lambda p: tree_sum(compute_signals(p))), path)

sig = jax.jit(lambda p: compute_signals(p))(path)
jax.block_until_ready(sig)

# Stage 7: strategy scan.
timeit("strategy scan (19)", jax.jit(lambda p, s: tree_sum(
    run_strategies_batch(p, s, apply_costs=True))), path, sig)

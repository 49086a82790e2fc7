"""Stage-by-stage wall-clock profile of the full institutional engine.

Run on the real TPU:  python scripts/profile_engine.py [B] [years]

Times each stage separately (innovation draws, joint+VIX scan, stress scan,
TE scan, window/compose, signals, strategy scan) plus the fused end-to-end
chunk, with a host fetch after every block (block_until_ready does not
synchronize through the tunnel — CLAUDE.md gotcha).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb
from letf_tpu.ops.path_engine import Innovations
from letf_tpu.parallel.mc_runner import _mc_chunk
from letf_tpu.strategies.engine import run_strategies_batch
from letf_tpu.strategies.signals import compute_signals

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
years = int(sys.argv[2]) if len(sys.argv) > 2 else 10
sim_days = years * 252
buffer_days = 0
print(f"platform={jax.devices()[0].platform} B={B} sim_days={sim_days}")

model = default_sim_model()
key = jax.random.key(0)
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


def timeit(label, fn, *args, n=3, **kw):
    out = fn(*args, **kw)           # compile
    jax.block_until_ready(out)
    _ = jax.tree.map(lambda x: np.asarray(x), out)   # force host fetch
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    leaves = jax.tree.leaves(out)
    _ = np.asarray(leaves[0])
    dt = (time.perf_counter() - t0) / n
    pd = B * sim_days / dt
    print(f"{label:34s} {dt*1e3:9.1f} ms   {pd/1e6:9.1f}M path-days/s")
    return out


# Full fused chunk (what production runs).
timeit("FULL chunk (paths+sig+strats)", lambda: _mc_chunk(
    model, key, ids, anti, sim_days, buffer_days,
    random_start_method="none", apply_costs=True)[0])

# Stage 1: innovation draws (fast samplers).
draw = jax.jit(lambda: pb.draw_innovations_fast(
    model, key, ids, anti, sim_days, buffer_days, "none"))
innov = timeit("innovations (fast draws)", draw)

# Innovation sub-pieces.
tks = jax.vmap(lambda t: jax.random.fold_in(key, t))(ids)
timeit("  eps normals [B,T,3]", jax.jit(
    lambda: jax.vmap(lambda k: jax.random.normal(k, (sim_days, 3)))(tks)))
timeit("  chi gammas [B,2,T]", jax.jit(
    lambda: jax.vmap(lambda k: jnp.stack([
        2.0 * jax.random.gamma(jax.random.fold_in(k, r), 4.0, (sim_days,))
        for r in range(2)]))(tks)))
timeit("  regime spell method", jax.jit(
    lambda: pb.simulate_regime_paths_spell(
        model, tks, jnp.zeros((B,), jnp.int32), sim_days)))
timeit("  te t-draws [B,T,6]", jax.jit(
    lambda: jax.vmap(lambda k: pb.t_int_df(k, 5, (sim_days, 6)))(tks)))

# Stage 2: joint + VIX scan.
jv = jax.jit(lambda iv: pb.simulate_joint_and_vix_batched(
    model, iv.regime_full, iv.eps, iv.u_chi, iv.vix_noise))
x, vix = timeit("joint+VIX scan", jv, innov)

regime = innov.regime_full

# Stage 3: stress scan.
st = jax.jit(lambda iv, vv: pb.simulate_stress_batched(
    model, iv.regime_full, vv, iv.stress_norms, iv.u_jump, iv.t_abs))
timeit("stress scan", st, innov, vix)

# Stage 4: TE scan.
und = jnp.stack([x[..., 0]] * 6, axis=-1)
te = jax.jit(lambda iv, vv, uu: pb.simulate_tracking_error_batched(
    model, iv.regime_full, vv, uu, iv.te_draws))
timeit("TE scan", te, innov, vix, und)

# Stage 5: full path_from_innovations (all of the above + compose).
pfi = jax.jit(lambda iv: pb.path_from_innovations_batched(
    model, iv, sim_days))
path = timeit("path_from_innovations (all)", pfi, innov)

# Stage 6: signals.
sig_fn = jax.jit(lambda p: compute_signals(p))
sig = timeit("signals", sig_fn, path)

# Stage 7: strategy scan.
strat = jax.jit(lambda p, s: run_strategies_batch(p, s, apply_costs=True))
timeit("strategy scan (19)", strat, path, sig)

import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb

model = default_sim_model()
key = jax.random.key(0)
B, S = 8192, 2520
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)
gen = jax.jit(pb.generate_paths_batched,
              static_argnames=("sim_days", "buffer_days", "random_start_method",
                               "fast_draws", "joint_kernel"))
pk = gen(model, key, ids, anti, sim_days=S, buffer_days=0,
         random_start_method="none", joint_kernel="auto")
jax.block_until_ready(pk.etf_ret)
print("kernel path ok", flush=True)
px = gen(model, key, ids, anti, sim_days=S, buffer_days=0,
         random_start_method="none", joint_kernel="off")
jax.block_until_ready(px.etf_ret)
for name in ("spy_ret", "qqq_ret", "tlt_ret", "vix"):
    a = np.asarray(getattr(pk, name)).ravel()
    b = np.asarray(getattr(px, name)).ravel()
    print(f"{name}: kernel {a.mean():+.6f}/{a.std():.6f} | xla {b.mean():+.6f}/{b.std():.6f}")
# pair correlation (antithetic works end to end)
a0 = np.asarray(pk.spy_ret[0::2]); a1 = np.asarray(pk.spy_ret[1::2])
print("pair corr(spy):", round(float(np.corrcoef(a0.ravel(), a1.ravel())[0,1]), 3))
# replay invariance: trial 5's path identical in a different batch layout
sub_ids = ids[8:16]; sub_anti = anti[8:16]
pad = 1024 - 8
ids2 = jnp.concatenate([sub_ids, jnp.zeros(pad, jnp.int32)])
anti2 = jnp.concatenate([sub_anti, jnp.zeros(pad, bool)])
pk2 = gen(model, key, ids2, anti2, sim_days=S, buffer_days=0,
          random_start_method="none", joint_kernel="auto")
same = np.array_equal(np.asarray(pk.etf_ret[8:16]), np.asarray(pk2.etf_ret[:8]))
print("replay-invariant across layouts:", same)
# timing
t0 = time.perf_counter()
for _ in range(5):
    out = gen(model, key, ids, anti, sim_days=S, buffer_days=0,
              random_start_method="none", joint_kernel="auto")
float(jnp.sum(out.vix))
print(f"full path-gen kernel-mode: {(time.perf_counter()-t0)/5*1e3:.1f} ms")
t0 = time.perf_counter()
for _ in range(5):
    out = gen(model, key, ids, anti, sim_days=S, buffer_days=0,
              random_start_method="none", joint_kernel="off")
float(jnp.sum(out.vix))
print(f"full path-gen xla-mode:    {(time.perf_counter()-t0)/5*1e3:.1f} ms")

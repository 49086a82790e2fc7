"""Time the spell-method regime generation alone (the innovations hot spot)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb
from letf_tpu.ops import rng as rngs

B, T = 16384, 3780
model = default_sim_model()
ids = jnp.arange(B, dtype=jnp.int32) // 2


@jax.jit
def regime_fn(key):
    tks = jax.vmap(lambda t: rngs.trial_key(key, t))(ids)
    keys = jax.vmap(lambda k: rngs.stream(k, rngs.REGIME))(tks)
    start = jnp.zeros((B,), jnp.int32)
    r = pb.simulate_regime_paths_spell(model, keys, start, T)
    return jnp.sum(r)


def timeit(fn, label, n=5):
    fn(jax.random.key(0))
    t0 = time.perf_counter()
    for i in range(n):
        float(fn(jax.random.key(i + 1)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:20s} {dt * 1e3:9.1f} ms")


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}  B={B}  T={T}")
    timeit(lambda k: float(regime_fn(k)), "regime spell")

"""Sub-stage timing inside the spell regime path."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import rng as rngs

B, T = 16384, 3780
K = max(64, T // 12)
model = default_sim_model()
ids = jnp.arange(B, dtype=jnp.int32) // 2


def u_draws(key):
    tks = jax.vmap(lambda t: rngs.trial_key(key, t))(ids)
    keys = jax.vmap(lambda k: rngs.stream(k, rngs.REGIME))(tks)
    return jax.vmap(lambda k: jax.random.uniform(k, (K,)))(keys)


@jax.jit
def stage_u(key):
    return jnp.sum(u_draws(key))


@jax.jit
def stage_dwell(key):
    u = u_draws(key)
    reg = model.regime
    p_stay = jnp.asarray(reg.p_stay)
    geo0 = jnp.maximum(jnp.ceil(jnp.log1p(-u) / jnp.log(p_stay[0])), 1.0)
    geo1 = jnp.maximum(jnp.ceil(jnp.log1p(-u) / jnp.log(p_stay[1])), 1.0)
    parity = (jnp.arange(K, dtype=jnp.int32) % 2)[None, :]
    dwell = jnp.where(parity == 0, geo0, geo1)
    return jnp.sum(dwell)


@jax.jit
def stage_matmul(key):
    u = u_draws(key)
    reg = model.regime
    p_stay = jnp.asarray(reg.p_stay)
    geo0 = jnp.maximum(jnp.ceil(jnp.log1p(-u) / jnp.log(p_stay[0])), 1.0)
    geo1 = jnp.maximum(jnp.ceil(jnp.log1p(-u) / jnp.log(p_stay[1])), 1.0)
    parity = (jnp.arange(K, dtype=jnp.int32) % 2)[None, :]
    dwell = jnp.where(parity == 0, geo0, geo1)
    ends = jnp.cumsum(jnp.ceil(dwell).astype(jnp.int32), axis=1)
    W = 64
    nb = (T + W - 1) // W
    eb = ends // W
    ep = ends - eb * W
    H = (eb[:, :, None] == jnp.arange(nb)[None, None, :])
    C = (ep[:, :, None] <= jnp.arange(W)[None, None, :])
    within = jnp.einsum("bkt,bkp->btp", H.astype(jnp.bfloat16),
                        C.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32).astype(jnp.int32)
    bc = within[:, :, -1]
    coarse = jnp.cumsum(bc, axis=1) - bc
    completed = (coarse[:, :, None] + within).reshape(B, nb * W)[:, :T]
    return jnp.sum(completed % 2)


def timeit(fn, label, n=5):
    fn(jax.random.key(0))
    t0 = time.perf_counter()
    for i in range(n):
        float(fn(jax.random.key(i + 1)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:22s} {dt * 1e3:9.1f} ms")


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}  B={B}  T={T}  K={K}")
    timeit(lambda k: float(stage_u(k)), "u draws [B,K]")
    timeit(lambda k: float(stage_dwell(k)), "+geo dwell")
    timeit(lambda k: float(stage_matmul(k)), "+ends/matmul/parity")

"""Split path-generation timing: innovations / joint kernel / window /
compose, to locate what remains of the 138 ms paths stage."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb
from letf_tpu.ops.pallas_joint import _pack_params, pallas_joint_generate
from letf_tpu.ops.pallas_window import window_offsets_pallas

B, years = 16384, 10
sim_days, buffer_days = years * 252, 1260
T = sim_days + buffer_days
model = default_sim_model()
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


def timeit(fn, label, n=3):
    fn(0)
    t0 = time.perf_counter()
    for i in range(n):
        fn(i + 1)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:26s} {dt * 1e3:9.1f} ms")
    return dt


@jax.jit
def innov_fn(key):
    innov = pb.draw_innovations_fast(model, key, ids, anti, sim_days,
                                     buffer_days, "offset",
                                     joint_draws=False)
    return jnp.sum(innov.regime_full) + jnp.sum(innov.start_offset)


@jax.jit
def joint_fn(key):
    innov = pb.draw_innovations_fast(model, key, ids, anti, sim_days,
                                     buffer_days, "offset",
                                     joint_draws=False)
    seed_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(key).reshape(-1)[:2], jnp.int32)
    signs = jnp.where(anti, -1.0, 1.0).astype(jnp.float32)
    x, vix, irx = pallas_joint_generate(
        _pack_params(model), jnp.asarray(model.joint.chi_cheb, jnp.float32),
        innov.regime_full, ids, signs, seed_words, T)
    return jnp.sum(x[:, -1]) + jnp.sum(vix[:, -1]) + jnp.sum(irx[:, -1])


@jax.jit
def joint_window_fn(key):
    innov = pb.draw_innovations_fast(model, key, ids, anti, sim_days,
                                     buffer_days, "offset",
                                     joint_draws=False)
    seed_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(key).reshape(-1)[:2], jnp.int32)
    signs = jnp.where(anti, -1.0, 1.0).astype(jnp.float32)
    x, vix, irx = pallas_joint_generate(
        _pack_params(model), jnp.asarray(model.joint.chi_cheb, jnp.float32),
        innov.regime_full, ids, signs, seed_words, T)
    packed = jnp.stack([x[..., 0], x[..., 1], x[..., 2], vix, irx,
                        innov.regime_full.astype(jnp.float32)],
                       axis=0).transpose(0, 2, 1)
    w = window_offsets_pallas(packed, innov.start_offset, sim_days)
    return jnp.sum(w[:, -1, :])


def run(fn):
    def f(i):
        return float(fn(jax.random.key(i)))
    return f


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}  B={B}  T={T}  S={sim_days}")
    d0 = timeit(run(innov_fn), "innovations (regime etc.)")
    d1 = timeit(run(joint_fn), "+joint kernel")
    d2 = timeit(run(joint_window_fn), "+window kernel")
    print(f"joint ~= {(d1 - d0) * 1e3:.1f} ms, window ~= {(d2 - d1) * 1e3:.1f} ms,"
          f" compose+rest ~= {(138.1 - d2 * 1e3):.1f} ms (vs 138.1 total)")

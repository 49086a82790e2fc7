"""Stage-level timing of the slab-native production pipeline on TPU.

Times cumulative prefixes of ops/slab_chunk.py at the production chunk
shape so per-stage cost = adjacent difference:
  P0 innovations (regime spells + offsets)
  P1 + pallas_joint (GARCH/DCC-t + VIX + IRX, in-kernel RNG)
  P2 + slab windowing (per-trial random-start shift-select)
  P3 full slab_chunk_summaries (+ compose/signals/strategies + validity)

Each prefix returns a scalar; the timer forces a host fetch per rep
(block_until_ready does not synchronize through the tunnel).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb
from letf_tpu.ops.pallas_compose import _pack_asset_params, _pack_stress_params
from letf_tpu.ops.pallas_joint import _pack_params, pallas_joint_generate
from letf_tpu.ops.pallas_window import window_offsets_slab
from letf_tpu.ops.path_engine import _to_device
from letf_tpu.ops.slab_chunk import slab_chunk_summaries

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
years = int(sys.argv[2]) if len(sys.argv) > 2 else 30
sim_days, buffer_days = years * 252, 1260
T = sim_days + buffer_days
model = jax.tree.map(jnp.asarray, default_sim_model())
ids = jnp.arange(B, dtype=jnp.int32) // 2
anti = (jnp.arange(B) % 2).astype(bool)


SUB = next(h for h in (32, 16, 8) if B % (h * 128) == 0)


def _joint(key):
    innov = pb.draw_innovations_fast(
        model, key, ids, anti, sim_days, buffer_days, "offset",
        anchors=None, joint_draws=False, aux_draws=False)
    seed_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(key).reshape(-1)[:2], jnp.int32)
    signs = jnp.where(anti, -1.0, 1.0).astype(jnp.float32)
    xs = pallas_joint_generate(
        _pack_params(model), jnp.asarray(model.joint.chi_cheb, jnp.float32),
        innov.regime_full, ids, signs, seed_words, T, layout="slab",
        sub=SUB)
    return innov, seed_words, xs


@jax.jit
def p0(key):
    innov = pb.draw_innovations_fast(
        model, key, ids, anti, sim_days, buffer_days, "offset",
        anchors=None, joint_draws=False, aux_draws=False)
    return (jnp.sum(innov.regime_full[:, -1].astype(jnp.float32))
            + jnp.sum(innov.start_offset))


@jax.jit
def p1(key):
    _, _, xs = _joint(key)
    return sum(jnp.sum(x[:, -1]) for x in xs[:5])


@jax.jit
def p2(key):
    innov, _, xs = _joint(key)
    x0, x1, x2, vix, irx, reg = xs
    win = [window_offsets_slab(c, innov.start_offset, sim_days)
           for c in (x0, x1, x2, vix, irx, reg.astype(jnp.float32))]
    return sum(jnp.sum(w[:, -1]) for w in win)


@jax.jit
def p3(key):
    s = slab_chunk_summaries(model, key, ids, anti, sim_days=sim_days,
                             buffer_days=buffer_days,
                             random_start_method="offset")
    return jnp.sum(s["final_wealth"])


def t(fn, label, n=3):
    out = float(fn(jax.random.key(0)))  # compile + sanity fetch
    t0 = time.perf_counter()
    for i in range(n):
        out = float(fn(jax.random.key(i + 1)))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:16s} {dt * 1e3:9.1f} ms   "
          f"({B * sim_days / dt / 1e6:8.1f}M path-days/s)", flush=True)
    return dt


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}  B={B}  years={years}  "
          f"T={T}", flush=True)
    d0 = t(p0, "innov+regime")
    d1 = t(p1, "+joint")
    d2 = t(p2, "+window")
    d3 = t(p3, "full slab chunk")
    print(f"stages: innov={d0*1e3:.0f}  joint={((d1-d0))*1e3:.0f}  "
          f"window={(d2-d1)*1e3:.0f}  compose+strat={(d3-d2)*1e3:.0f} ms")

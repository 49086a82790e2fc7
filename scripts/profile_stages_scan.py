"""Amortized stage costs of the slab pipeline: K-chunk device-side scan
per cumulative cut point (P1 innov, P2 +joint, P3 +window, P4 +compose/
strategies, P5 full summaries). Kernel outputs are opaque to XLA, so each
cut forces everything before it; the scalar carried out of the scan keeps
the last stage alive."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/letf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from letf_tpu.models.params import default_sim_model
from letf_tpu.ops import path_batched as pb
from letf_tpu.ops.path_engine import _to_device
from letf_tpu.ops.pallas_compose import _pack_asset_params, _pack_stress_params
from letf_tpu.ops.pallas_joint import _pack_params, pallas_joint_generate
from letf_tpu.ops.pallas_strategies import pallas_compose_strategies_run
from letf_tpu.ops.pallas_window import window_offsets_slab

B, K, SIM, BUF = 16384, 16, 7560, 1260
T = SIM + BUF
model = _to_device(jax.tree.map(jnp.asarray, default_sim_model()))
run_key = jax.random.key(5)


def chunk_to(stage: int, ci):
    ids = ci * B + jnp.arange(B, dtype=jnp.int32) // 2 * 2 + 0  # trial ids
    ids = ci * B + jnp.arange(B, dtype=jnp.int32) // 2
    anti = (jnp.arange(B) % 2).astype(bool)
    sub = 32                      # match production slab_chunk geometry

    offs_pre = pb.start_offsets_only(run_key, ids, BUF)
    perm = jnp.argsort(offs_pre)
    ids = ids[perm]
    anti = anti[perm]

    innov = pb.draw_innovations_fast(
        model, run_key, ids, anti, SIM, BUF, "offset",
        joint_draws=False, aux_draws=False)
    if stage == 1:
        return (jnp.sum(innov.regime_full.astype(jnp.float32))
                + jnp.sum(innov.start_offset))

    seed_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(run_key).reshape(-1)[:2], jnp.int32)
    signs = jnp.where(anti, -1.0, 1.0).astype(jnp.float32)
    ids32 = ids.astype(jnp.int32)
    x0, x1, x2, vix_full, irx_full, reg_slab = pallas_joint_generate(
        _pack_params(model), jnp.asarray(model.joint.chi_cheb, jnp.float32),
        innov.regime_full, ids32, signs, seed_words, T, layout="slab",
        sub=sub)
    theo = jnp.asarray(model.joint.theo_mean, jnp.float32)
    biases = [(theo[c] - xc.mean(axis=1)) * 0.1
              for c, xc in enumerate((x0, x1, x2))]
    if stage == 2:
        return (x0[0, 0].sum() + x1[0, 0].sum() + x2[0, 0].sum()
                + vix_full[0, 0].sum() + irx_full[0, 0].sum()
                + reg_slab[0, 0].astype(jnp.float32).sum()
                + sum(b.sum() for b in biases))

    offs = innov.start_offset
    win = [window_offsets_slab(c, offs, SIM, bias=b)
           for c, b in ((x0, biases[0]), (x1, biases[1]), (x2, biases[2]),
                        (vix_full, None), (irx_full, None),
                        (reg_slab.astype(jnp.float32), None))]
    spy, qqq, tlt, vix_slab, irx_slab, regime_slab = win
    if stage == 3:
        return sum(w[0, 0].sum() for w in win)

    (fw, nt, mdd, path_finite, jc, ls, cs, vix_min, vix_max,
     regime_high) = pallas_compose_strategies_run(
        _pack_stress_params(model), _pack_asset_params(model),
        ids32, seed_words, spy, qqq, tlt, vix_slab, irx_slab, regime_slab,
        sim_days=SIM, cashflows=None, apply_costs=True)
    if stage == 4:
        return jnp.sum(fw)

    vix_ok = (vix_min >= 5.0) & (vix_max <= 120.0)
    return (jnp.sum(fw) + jnp.sum(nt) + jnp.sum(mdd)
            + jnp.sum(vix_ok) + jnp.sum(path_finite)
            + jnp.sum(regime_high).astype(jnp.float32))


def timed(stage):
    @jax.jit
    def run(seed):
        def body(acc, ci):
            return acc + chunk_to(stage, ci), ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.int32))
        return acc

    x = float(run(jnp.int32(0)))  # compile
    best = 1e9
    for i in range(2):
        t0 = time.perf_counter()
        float(run(jnp.int32(i)))
        best = min(best, time.perf_counter() - t0)
    return best / K * 1e3, x


prev = 0.0
for st, name in [(1, "innov+regime"), (2, "+joint+mm"), (3, "+window"),
                 (4, "+compose+strategies"), (5, "full summaries")]:
    ms, _ = timed(st)
    print(f"P{st} {name:22s}: {ms:7.1f} ms/chunk  (delta {ms - prev:+6.1f})",
          flush=True)
    prev = ms

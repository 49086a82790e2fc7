"""Slab-native production chunk: one fused pass from model parameters to
strategy summaries, with every inter-kernel tensor kept in the Pallas
kernels' [G, S, 8, 128] trial-tile layout.

The chain is three kernels plus a scan-free regime stage:

  regime spells (XLA: MXU parity matmul + two-level dwell CDF search)
  -> pallas_joint (in-kernel counter RNG, GARCH/DCC-t + VIX + IRX)
  -> pallas_window (per-trial random-start shift-select windowing)
  -> pallas_compose_strategies (stress + jumps + funding + leverage/TE
     composition, per-day repair, 16 in-kernel rolling signals, all 19
     strategies)

Only [B]-sized summaries leave the device path: the innovation tensors,
the six etf return series, the cash series, and every rolling signal
never exist in HBM. The general [B, S] path (ops/path_batched.py +
strategies/engine.py) had every kernel boundary paying [B, S] <-> slab
transpose staging and a separate XLA pass per stage — at B=16384 x 10y
that pipeline measured ~3x this one.

Draws are identical to generate_paths_batched's kernel path (same
counter-based kernels); results match up to f32 fusion/signal ulps, and
summaries (valid/repaired/jump/liq) are bitwise equal. Used by
parallel/mc_runner's _mc_chunk_body on TPU/f32 when B % 1024 == 0 and no
trade emission is requested; every other configuration takes the general
path, which remains the f64 oracle-anchored reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from letf_tpu.models.params import SimModel
from letf_tpu.ops.path_engine import _to_device

_LANES = 128
_FORCE_SUB = None            # profiling hook (scripts/profile_sub_sweep.py)


@functools.partial(jax.jit, static_argnames=(
    "sim_days", "buffer_days", "random_start_method", "apply_costs",
    "moment_matching", "max_spells"))
def slab_chunk_summaries(model: SimModel, run_key, trial_ids, antithetic,
                         sim_days: int, buffer_days: int = 0,
                         random_start_method: str = "offset",
                         anchors=None, cashflows=None,
                         apply_costs: bool = True,
                         moment_matching: bool = True,
                         max_spells: int | None = None):
    """One fused production chunk (institutional_v1, stress + funding on):
    returns the summaries dict of _mc_chunk_body. B must be a multiple of
    1024; f32 TPU only (the kernels have no CPU lowering)."""
    from letf_tpu.ops import path_batched as pb
    from letf_tpu.ops.pallas_compose import (
        _pack_asset_params,
        _pack_stress_params,
    )
    from letf_tpu.ops.pallas_joint import _pack_params, pallas_joint_generate
    from letf_tpu.ops.pallas_strategies import pallas_compose_strategies_run
    from letf_tpu.ops.pallas_window import window_offsets_slab

    model = _to_device(model)
    B = trial_ids.shape[0]
    assert B % 1024 == 0, B
    # Sublane height of the trial tiles: tallest of 32/16/8 dividing B/128.
    # The serial day loops are per-op latency dominated at (8, 128); taller
    # tiles give every VPU op 2-4 independent sub-tiles to overlap.
    # (_FORCE_SUB is a profiling hook — scripts/profile_sub_sweep.py.)
    sub = _FORCE_SUB or next(h for h in (32, 16, 8)
                             if B % (h * _LANES) == 0)
    T = sim_days + buffer_days

    # Sort trial lanes by start offset so each 128-lane plane of the
    # windowing kernel sees a tight offset range and its predicated
    # shift-select levels collapse to ~log2(spread) instead of
    # log2(buffer). Every per-trial value is a pure function of
    # (run_key, trial_id), so lane order is free; summaries are
    # unsorted back below — results are bitwise identical.
    inv = None
    if random_start_method == "offset" and buffer_days > 0:
        offs_pre = pb.start_offsets_only(run_key, trial_ids, buffer_days)
        perm = jnp.argsort(offs_pre)
        inv = jnp.argsort(perm)
        trial_ids = trial_ids[perm]
        antithetic = antithetic[perm]

    innov = pb.draw_innovations_fast(
        model, run_key, trial_ids, antithetic, sim_days, buffer_days,
        random_start_method, anchors=anchors, joint_draws=False,
        aux_draws=False, max_spells=max_spells)

    seed_words = jax.lax.bitcast_convert_type(
        jax.random.key_data(run_key).reshape(-1)[:2], jnp.int32)
    signs = jnp.where(antithetic, -1.0, 1.0).astype(jnp.float32)
    ids32 = trial_ids.astype(jnp.int32)

    x0, x1, x2, vix_full, irx_full, reg_full_slab = pallas_joint_generate(
        _pack_params(model), jnp.asarray(model.joint.chi_cheb, jnp.float32),
        innov.regime_full, ids32, signs, seed_words, T, layout="slab",
        sub=sub)
    # Moment matching as a per-lane BIAS added inside the window kernel's
    # output store (bitwise equal to adjusting the full slab first —
    # window(x) + b == window(x + b) elementwise — without materializing
    # three adjusted [G, T, sub, 128] slabs in HBM).
    biases = [None, None, None]
    if moment_matching:
        theo = jnp.asarray(model.joint.theo_mean, jnp.float32)
        biases = [(theo[c] - xc.mean(axis=1)) * 0.1
                  for c, xc in enumerate((x0, x1, x2))]

    if buffer_days > 0:
        offs = innov.start_offset
        win = [window_offsets_slab(c, offs, sim_days, bias=b)
               for c, b in ((x0, biases[0]), (x1, biases[1]),
                            (x2, biases[2]), (vix_full, None),
                            (irx_full, None),
                            (reg_full_slab.astype(jnp.float32), None))]
        spy, qqq, tlt, vix_slab, irx_slab, regime_slab = win
    else:
        spy, qqq, tlt = (c if b is None else c + b[:, None]
                         for c, b in zip((x0, x1, x2), biases))
        vix_slab, irx_slab = vix_full, irx_full
        regime_slab = reg_full_slab.astype(jnp.float32)

    # ---- stress + costs + TE + signals + strategies: ONE kernel.
    # The six etf return tensors, the cash series, and all 16 signals
    # never exist in HBM; the per-day repair pass (bound + zero
    # non-finite returns) and the etf-finiteness flag run in-kernel. ----
    (fw, nt, mdd, path_finite, jc, ls, cs, vix_min, vix_max,
     regime_high) = pallas_compose_strategies_run(
        _pack_stress_params(model), _pack_asset_params(model),
        ids32, seed_words, spy, qqq, tlt, vix_slab, irx_slab, regime_slab,
        sim_days=sim_days, cashflows=cashflows, apply_costs=apply_costs)

    # ---- validity flags (twin of path_batched._finish_path), from the
    # kernel's in-chip accumulators — no post-kernel slab re-reads.
    # vix_ok needs no explicit isfinite: a NaN poisons the running
    # min/max (compares false), +-inf fails the bounds. ----
    vix_ok = (vix_min >= 5.0) & (vix_max <= 120.0)
    valid_pre = path_finite & vix_ok
    repaired = ~valid_pre
    valid = vix_ok
    out = dict(
        final_wealth=fw, num_trades=nt, max_dd=mdd,
        valid=valid, repaired=repaired,
        path_finite=path_finite, vix_ok=vix_ok,
        start_offset=innov.start_offset, start_regime=innov.start_regime,
        jump_days=jc.astype(jnp.int32),
        liq_mean=ls / sim_days, credit_mean=cs / sim_days,
        regime_high_days=regime_high)
    if inv is not None:
        # Undo the offset sort: row i of the sorted outputs holds trial
        # perm[i], so original order is x[inv] (inv = argsort(perm)).
        out = {k: v[inv] for k, v in out.items()}
    return out

"""Pallas TPU kernel: fused stress + tracking-error + LETF composition.

Phase 2 of the SURVEY §7.3 roadmap (phase 1 = ops/pallas_joint.py). Takes
the WINDOWED joint outputs (spy/qqq/tlt streams, VIX, IRX, regime — the
offset windowing runs first via ops/pallas_window.py) and produces net
LETF returns for all six assets in one pass:

  latent stress AR(1) channels + Bernoulli-t crisis jumps
  (reference calibration.py:787-830) -> signed jump adjustment of SPY/QQQ
  -> state-linked borrow spread (funding model) -> leverage/expense/
  financing composition (engine.py:128-154, 320-420) -> AR(1) tracking
  error with EMA de-bias and tanh clip (engine.py:157-203).

All stress/TE draws are counter-based in-kernel (same murmur3 scheme as
the joint kernel, different stream salts; pairs share draws via the base
trial id, matching fast_draws semantics where only joint normals are
antithetic-negated). Student-t draws (crisis-jump magnitude, per-asset
tracking error) use Bailey's exact polar method straight from two
uniform streams (see _t_polar) — the TE dfs are static asset config.

The carry (liq, cred, te[6], ema_bias[6]) lives in VMEM scratch across day
blocks; per-trial summaries (jump days, liq/cred sums) accumulate in
scratch and are written once on the last block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from letf_tpu import config as cfg
from letf_tpu.ops.pallas_joint import _bits_to_unit, _mix

_SUB, _LANES = 8, 128
TILE = _SUB * _LANES
_TWO_PI = 2.0 * math.pi
_A = cfg.N_ASSETS

_DAY_PRIME = np.uint32(0x7FEB352D)
_GOLD = np.uint32(0x9E3779B9)

# Draw-stream indices: the joint kernel consumes 1..6; this kernel's
# streams start at 16 (stress) and 32 (tracking error) so no (trial, day)
# counter ever collides across kernels.
_STRESS_IDX = 16
_TE_IDX = 32


def _stream_bits(day_key, idx: int):
    """Counter-based uint32 bits for draw index `idx` of this day."""
    return _mix(day_key + np.uint32((0x9E3779B9 * idx) & 0xFFFFFFFF))


def _normals(day_key, idx0: int, n: int):
    """n standard normals per lane from draw indices idx0, idx0+1, ...."""
    us = [_bits_to_unit(_stream_bits(day_key, idx0 + i))
          for i in range(2 * ((n + 1) // 2))]
    out = []
    for p in range((n + 1) // 2):
        u1, u2 = us[2 * p], us[2 * p + 1]
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = _TWO_PI * u2
        out.append(rad * jnp.cos(ang))
        out.append(rad * jnp.sin(ang))
    return out[:n]


def _uniforms(day_key, idx0: int, n: int):
    return [_bits_to_unit(_stream_bits(day_key, idx0 + i))
            for i in range(n)]


def _t_polar(day_key, idx0: int, df: float):
    """One EXACT Student-t(df) draw from TWO uniform counter streams
    (Bailey 1994, the trig form of the polar method):

        t = sqrt(df * (u1^(-2/df) - 1)) * cos(2*pi*u2)

    Replaces the (Box-Muller normal, chi-square log-quantile Chebyshev)
    pair this kernel used previously: same two (trial, day, idx) streams,
    ~half the VPU ops (no second Box-Muller leg, no 13-term Clenshaw, no
    exp/divide), and exact tails instead of a quantile polynomial.
    df -> inf recovers Box-Muller: u1^(-2/df)-1 ~ -(2/df)ln(u1)."""
    u1, u2 = _uniforms(day_key, idx0, 2)
    w = jnp.exp(jnp.log(u1) * (-2.0 / df)) - 1.0
    return jnp.sqrt(df * w) * jnp.cos(_TWO_PI * u2)


def _compose_kernel(seed_ref, sp_ref, ap_ref, ids_ref,
                    spy_ref, qqq_ref, tlt_ref, vix_ref, irx_ref, reg_ref,
                    etf_refs_cash_rf_sum, state, *,
                    day_block: int, n_blocks: int, use_stress: bool,
                    use_funding: bool, und_idx: tuple):
    """One (tile, day-block) program.

    seed_ref: [2] int32 run-seed words (SMEM)
    sp_ref:   [NSP, 2] f32 per-regime stress/cash params (SMEM)
    ap_ref:   [NAP, A] f32 per-asset params (SMEM)
    ids_ref:  [1, 8, 128] int32 base trial ids
    spy/qqq/tlt/vix/irx: [1, day_block, 8, 128] f32 windowed inputs
    reg_ref:  [1, day_block, 8, 128] int8 windowed regime
    outputs (in etf_refs_cash_rf_sum): 6 etf channels, spy_adj, qqq_adj,
    cash, then summaries [1, 8, 8, 128] (rows: jump_count, liq_sum,
    cred_sum; 5 spare)
    state:    [18, 8, 128] f32 scratch carried across day blocks
    """
    (e0_ref, e1_ref, e2_ref, e3_ref, e4_ref, e5_ref,
     spya_ref, qqqa_ref, cash_ref, sum_ref) = etf_refs_cash_rf_sum
    etf_out = (e0_ref, e1_ref, e2_ref, e3_ref, e4_ref, e5_ref)
    j = pl.program_id(1)

    (LIQ_MU, LIQ_PHI, LIQ_SIG, CRED_MU, CRED_PHI, CRED_SIG,
     JP_BASE, JP_SCALE, CASH_RATE) = range(9)
    (LEV, ER, BETA, FSPREAD, RHO, SQ, TE_SCALE, DOWNSIDE, CLIP) = range(9)
    (F_BASE, F_BVIX, F_BINV, F_BLIQ, F_BCRED, F_MIN, F_MAX) = range(9, 16)

    def SP(i):
        return sp_ref[i, 0], sp_ref[i, 1]

    s0 = seed_ref[0].astype(jnp.uint32)
    s1 = seed_ref[1].astype(jnp.uint32)
    ids_u = pltpu.bitcast(ids_ref[0], jnp.uint32)
    lane_key = _mix(ids_u * _GOLD ^ s0)

    @pl.when(j == 0)
    def _():
        state[...] = jnp.zeros((18, _SUB, _LANES), jnp.float32)

    def body(d, _):
        liq, cred = state[0], state[1]
        te = [state[2 + a] for a in range(_A)]
        bias = [state[8 + a] for a in range(_A)]
        jump_cnt, liq_sum, cred_sum = state[14], state[15], state[16]

        r = reg_ref[0, d].astype(jnp.float32)
        spy = spy_ref[0, d]
        qqq = qqq_ref[0, d]
        tlt = tlt_ref[0, d]
        vix = vix_ref[0, d]
        irx = irx_ref[0, d]

        def g2(idx):
            a, b = SP(idx)
            return a + (b - a) * r

        s = (j * day_block + d).astype(jnp.uint32)
        day_key = _mix(lane_key ^ (s * _DAY_PRIME) ^ s1)
        first = (j == 0) & (d == 0)
        firstf = jnp.float32(jnp.where(first, 1.0, 0.0))

        # ---- latent stress + crisis jumps (window day 0 inits at mu) ----
        if use_stress:
            n_liq, n_cred = _normals(day_key, _STRESS_IDX, 2)
            (u_jump,) = _uniforms(day_key, _STRESS_IDX + 4, 1)
            lmu, cmu = g2(LIQ_MU), g2(CRED_MU)
            liq_n = jnp.clip(lmu + g2(LIQ_PHI) * (liq - lmu)
                             + g2(LIQ_SIG) * n_liq, 0.0, 3.0)
            cred_n = jnp.clip(cmu + g2(CRED_PHI) * (cred - cmu)
                              + g2(CRED_SIG) * n_cred, 0.0, 3.0)
            liq_n = lmu * firstf + liq_n * (1.0 - firstf)
            cred_n = cmu * firstf + cred_n * (1.0 - firstf)
            vix_amp = jnp.maximum((vix - 25.0) / 30.0, 0.0)
            p = jnp.clip(g2(JP_BASE) + 0.008 * vix_amp + 0.003 * liq_n,
                         0.0, 0.01)
            # The polar t's sign is an independent fair coin (sign(cos) is
            # uniform over the quarter-periods and independent of |cos|),
            # so the signed draw replaces the old |t| * Rademacher(u_sign)
            # pair: same joint distribution, one fewer uniform per day.
            t5 = _t_polar(day_key, _STRESS_IDX + 2, 5.0)
            jump_on = ((u_jump < p).astype(jnp.float32)
                       * (1.0 - firstf))
            signed_jump = jump_on * t5 * g2(JP_SCALE)
            spy_a = jnp.clip(spy - signed_jump, -0.95, 3.0)
            qqq_a = jnp.clip(qqq - 1.12 * signed_jump, -0.95, 4.0)
            jump_cnt = jump_cnt + jump_on
            liq_sum = liq_sum + liq_n
            cred_sum = cred_sum + cred_n
        else:
            liq_n = jnp.zeros_like(vix)
            cred_n = jnp.zeros_like(vix)
            spy_a, qqq_a = spy, qqq

        risk_free = jnp.clip(irx, 0.0, 20.0) / 100.0

        # ---- state-linked borrow spread ----
        if use_funding:
            term = 1.25 - 1.1 * jnp.clip(cred_n, 0.0, 3.0)
            inv_curve = jnp.maximum(-term, 0.0)
            stress_v = jnp.maximum(vix - 20.0, 0.0)
            fb = sp_ref[F_BASE, 0]
            spread = (fb + sp_ref[F_BVIX, 0] * stress_v
                      + sp_ref[F_BINV, 0] * inv_curve
                      + sp_ref[F_BLIQ, 0] * jnp.clip(liq_n, 0.0, 3.0)
                      + sp_ref[F_BCRED, 0] * jnp.clip(cred_n, 0.0, 3.0))
            spread = jnp.clip(spread, sp_ref[F_MIN, 0], sp_ref[F_MAX, 0])

        # ---- per-asset composition + tracking error ----
        streams = (spy_a, qqq_a, tlt)
        vix_mult = jnp.clip(jnp.sqrt(vix / 20.0), 0.5, 1.5)
        regime_mult = 1.0 + 0.15 * r
        for a in range(_A):
            und = streams[und_idx[a]] * ap_ref[BETA, a]
            lev = ap_ref[LEV, a]
            sp_a = spread if use_funding else ap_ref[FSPREAD, a]
            borrow = (jnp.maximum(lev - 1.0, 0.0)
                      * jnp.maximum(risk_free + sp_a, 0.0) / 252.0)
            lev_ret = lev * und - ap_ref[ER, a] / 252.0 - borrow

            t_a = _t_polar(day_key, _TE_IDX + 2 * a, float(_TE_DFS[a]))
            neg = (und < 0).astype(jnp.float32)
            move = ((1.0 + 0.3 * jnp.abs(und))
                    * (ap_ref[DOWNSIDE, a] * neg + 0.98 * (1.0 - neg)))
            innov = t_a * ap_ref[TE_SCALE, a] * vix_mult * regime_mult
            te_n = ap_ref[RHO, a] * te[a] + ap_ref[SQ, a] * innov * move
            te_n = te_n * (1.0 - firstf)
            bias_n = _EMA_ALPHA * te_n + (1.0 - _EMA_ALPHA) * bias[a]
            # Dynamic tanh clip (calibrated limit; <= 0 disables): scalar
            # arithmetic select, no lane-broadcast where.
            cap = ap_ref[CLIP, a]
            safe = jnp.maximum(cap, 1e-6)
            raw = te_n - bias_n
            m = (cap > 0).astype(jnp.float32)
            te_out = m * (safe * jnp.tanh(raw / safe)) + (1.0 - m) * raw
            etf = jnp.clip(lev_ret + te_out, -0.999, 10.0)
            etf_out[a][0, d] = etf
            te[a] = te_n
            bias[a] = bias_n

        spya_ref[0, d] = spy_a
        qqqa_ref[0, d] = qqq_a
        cash_ref[0, d] = g2(CASH_RATE) / 252.0

        for i, v in enumerate([liq_n, cred_n] + te + bias
                              + [jump_cnt, liq_sum, cred_sum]):
            state[i] = v
        return 0

    jax.lax.fori_loop(0, day_block, body, 0)

    @pl.when(j == n_blocks - 1)
    def _():
        sum_ref[0, 0] = state[14]
        sum_ref[0, 1] = state[15]
        sum_ref[0, 2] = state[16]
        sum_ref[0, 3] = jnp.zeros((_SUB, _LANES), jnp.float32)
        sum_ref[0, 4] = jnp.zeros((_SUB, _LANES), jnp.float32)
        sum_ref[0, 5] = jnp.zeros((_SUB, _LANES), jnp.float32)
        sum_ref[0, 6] = jnp.zeros((_SUB, _LANES), jnp.float32)
        sum_ref[0, 7] = jnp.zeros((_SUB, _LANES), jnp.float32)


_EMA_ALPHA = 2.0 / (126 + 1)
_TE_DFS = np.asarray(cfg.asset_table().te_df)


def _pack_stress_params(model):
    """[16, 2] f32: stress/cash per-regime rows + funding scalars."""
    S = model.stress
    f = lambda a: jnp.asarray(a, jnp.float32)      # noqa: E731
    F = model.funding
    two = lambda v: jnp.stack([jnp.asarray(v, jnp.float32)] * 2)  # noqa: E731
    rows = [f(S.liq_mu), f(S.liq_phi), f(S.liq_sigma),
            f(S.credit_mu), f(S.credit_phi), f(S.credit_sigma),
            f(S.jump_base_prob), f(S.jump_scale),
            f(model.cash_rate),
            two(F.base), two(F.beta_vix), two(F.beta_inv_curve),
            two(F.beta_liquidity), two(F.beta_credit),
            two(F.min_spread), two(F.max_spread)]
    return jnp.stack(rows)


def _pack_asset_params(model):
    """[9, A] f32 per-asset rows."""
    P, Tk = model.assets, model.tracking
    f = lambda a: jnp.asarray(a, jnp.float32)      # noqa: E731
    rho = f(Tk.rho)
    sq = jnp.sqrt(jnp.maximum(1.0 - rho ** 2, 1e-6))
    return jnp.stack([f(P.leverage), f(P.expense_ratio), f(P.beta),
                      f(P.fallback_spread), rho, sq, f(Tk.te_scale),
                      f(Tk.downside_mult), f(Tk.clip_limit)])


@functools.partial(jax.jit,
                   static_argnames=("sim_days", "day_block", "use_stress",
                                    "use_funding", "layout", "interpret"))
def pallas_compose_generate(sp, ap, base_ids, seed_words,
                            spy, qqq, tlt, vix, irx, regime,
                            sim_days: int, day_block: int | None = None,
                            use_stress: bool = True,
                            use_funding: bool = True,
                            layout: str = "bs",
                            interpret: bool = False):
    """Windowed inputs [B, S] -> (etf_ret [B, S, A], spy_adj, qqq_adj,
    cash_ret [B, S], jump_days [B], liq_mean [B], cred_mean [B]).

    layout="slab" skips the output unslab transposes and returns
    (etf_slabs tuple of 6 [G, S, 8, 128], spy_adj_slab, qqq_adj_slab,
    cash_slab, jump_count [B], liq_sum [B], cred_sum [B]) — the native
    layout the slab pipeline (ops/slab_chunk.py) consumes."""
    if layout == "slab":
        # Inputs are already [G, S, 8, 128] slabs (regime may be f32 —
        # the kernel's astype is then the identity).
        G, S, _, _ = spy.shape
        B = G * TILE
        ins = [spy, qqq, tlt, vix, irx, regime]
    else:
        B, S = spy.shape
        assert B % TILE == 0, B
        G = B // TILE

        def slab(a, dt=jnp.float32):
            return (a.astype(dt).reshape(G, _SUB, _LANES, S)
                    .transpose(0, 3, 1, 2))

        ins = [slab(spy), slab(qqq), slab(tlt), slab(vix), slab(irx),
               slab(regime, jnp.int8)]
    und_key = tuple(int(i) for i in cfg.asset_table().underlying)
    from letf_tpu.ops.pallas_strategies import _pick_day_block
    day_block = _pick_day_block(sim_days, 15, _SUB, day_block,  # 6 in + 9 out
                                scratch_rows=18 + 8)
    NB = sim_days // day_block

    ids = base_ids.astype(jnp.int32).reshape(G, _SUB, _LANES)

    blk = pl.BlockSpec((1, day_block, _SUB, _LANES),
                       lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((G, S, _SUB, _LANES), jnp.float32)

    def wrapped(seed_ref, sp_ref, ap_ref, ids_ref, s0, s1, s2, s3, s4, s5,
                e0, e1, e2, e3, e4, e5, spya, qqqa, cash, summ, state):
        _compose_kernel(seed_ref, sp_ref, ap_ref, ids_ref,
                        s0, s1, s2, s3, s4, s5,
                        (e0, e1, e2, e3, e4, e5, spya, qqqa, cash, summ),
                        state, day_block=day_block, n_blocks=NB,
                        use_stress=use_stress, use_funding=use_funding,
                        und_idx=und_key)

    outs = pl.pallas_call(
        wrapped,
        grid=(G, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # seed words
            pl.BlockSpec(memory_space=pltpu.SMEM),    # stress params
            pl.BlockSpec(memory_space=pltpu.SMEM),    # asset params
            pl.BlockSpec((1, _SUB, _LANES), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # ids
        ] + [blk] * 6,
        out_specs=tuple([blk] * 9) + (
            pl.BlockSpec((1, 8, _SUB, _LANES), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),),
        out_shape=tuple([shp] * 9) + (
            jax.ShapeDtypeStruct((G, 8, _SUB, _LANES), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((18, _SUB, _LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seed_words.astype(jnp.int32), sp, ap, ids, *ins)

    summ = outs[9]
    flat = summ.transpose(0, 2, 3, 1).reshape(B, 8)
    if layout == "slab":
        return (tuple(outs[:_A]), outs[6], outs[7], outs[8],
                flat[:, 0], flat[:, 1], flat[:, 2])

    def unslab(a):
        return a.transpose(0, 2, 3, 1).reshape(B, S)

    etf = jnp.stack([unslab(outs[a]) for a in range(_A)], axis=-1)
    spy_a, qqq_a, cash = (unslab(outs[i]) for i in range(6, 9))
    return etf, spy_a, qqq_a, cash, flat[:, 0], flat[:, 1], flat[:, 2]

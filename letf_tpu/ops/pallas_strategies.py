"""Pallas TPU kernel: all 19 strategies' equity scan in VMEM.

Phase 3 of the SURVEY §7.3 roadmap (phase 1 = ops/pallas_joint.py,
phase 2 = ops/pallas_compose.py). Replaces the XLA ``lax.scan`` in
strategies/engine.py for the production (no trade emission) path: the
2,520-step day loop runs INSIDE one kernel per (trial-tile, day-block)
program, so the [NS, B] carries (equity, prev allocation, position
states, trade counts, running max, max drawdown) never round-trip to HBM
and there is no per-step dispatch overhead.

Semantics are a line-for-line restatement of strategies/engine.py's scan
body (itself the TPU rebuild of the reference's 15 per-day Python loops,
letf/strategy.py:55-1277), with the same reference quirks: S7 earns no
cash on the idle fraction, S8 is costless, S9 freezes on NaN-signal
days, S19 rebalances only past a 5% threshold, benchmark equity
compounds from day 0 while loop strategies start at day 1.

The ``*_prev`` signal reads (pandas shift(1)) are realized by carrying
yesterday's signal values in scratch — the XLA scan materializes 15+
shifted [S, B] copies in HBM; here each channel is read once.

Mosaic notes (see CLAUDE.md): every select whose operands can hold NaN
(the min_periods warm-up region of the signals) is a bitwise select
``(a & m) | (b & ~m)``; finite-operand selects are arithmetic blends.
Scalar conditions (day-0, S6's 21-day rebalance) never become
lane-broadcast ``jnp.where``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from letf_tpu import config as cfg

_LANES = 128
TILE = 8 * _LANES            # minimum trial tile (sub-tile granularity)
NS = cfg.N_STRATEGIES            # 19

_SPREAD = 0.0003                 # bid-ask spread per unit turnover
_TURNOVER_EPS = 1e-4
_POS_CASH, _POS_SAFE, _POS_RISKY = 0.0, 1.0, 2.0

# Channel order of the stacked input slabs (all [B, S] f32 on entry).
# Channels from index 7 on are read at shift(1) via the prev-scratch;
# spy_price is passed as a channel (not compounded in-kernel) so its
# values are bit-identical to the XLA path's cumprod — an iterated
# product differs by ulps (XLA reassociates cumprod) and flips borderline
# SMA/trend comparisons.
CHANNELS = (
    "r_tqqq", "r_spy", "r_sso", "r_tmf", "cash", "regime", "vix",
    "spy_price",
    "std20_mp20", "dstd20_mp20", "std5", "std10", "std20", "std60",
    "dstd20", "skew60", "mean60", "volmom5", "sum126",
    "sma200_mp1", "sma200", "sma100_mp1", "rsi14",
)
_CI = {name: i for i, name in enumerate(CHANNELS)}
NCH = len(CHANNELS)

# Scratch state rows.
_EQ = 0                      # 19 rows: equity
_PA = _EQ + NS               # 19 rows: prev allocation
_TR = _PA + NS               # 19 rows: trade counts (f32, exact ints)
_RM = _TR + NS               # 19 rows: running max
_DD = _RM + NS               # 19 rows: max drawdown
_POS4 = _DD + NS
_POS5 = _POS4 + 1
_POS8 = _POS5 + 1
_S6P0 = _POS8 + 1
_S6P1 = _S6P0 + 1
_S6E0 = _S6P1 + 1
_S6E1 = _S6E0 + 1
_PVIX = _S6E1 + 1            # prev-day VIX
_PSIG = _PVIX + 1            # prev-day shift(1) rows (channel order
                             # spy_price .. rsi14)
_NSIG = NCH - 7              # 16 shifted channels
NSTATE = _PSIG + _NSIG

# Fused-signals mode: running window-sum rows appended to the state.
(_S1_5, _S2_5, _S1_10, _S2_10, _S1_20, _S2_20, _S1_60, _S2_60, _S3_60,
 _N1_20, _N2_20, _SPY1_126, _P1_100, _P1_200, _G1_14, _L1_14) = range(
    NSTATE, NSTATE + 16)
NSTATE_FUSED = NSTATE + 16
# Fused-compose mode: stress/TE carries + summary accumulators appended
# after the signal sums (rows match ops/pallas_compose.py's scratch).
_C_LIQ = NSTATE_FUSED
_C_CRED = _C_LIQ + 1
_C_TE = _C_CRED + 1          # 6 rows: per-asset tracking-error state
_C_BIAS = _C_TE + 6          # 6 rows: per-asset EMA de-bias state
_C_JC = _C_BIAS + 6          # jump-day count
_C_LS = _C_JC + 1            # liquidity sum
_C_CS = _C_LS + 1            # credit sum
_C_FIN = _C_CS + 1           # 1.0 while every etf/tlt/vix value is finite
_C_VMIN = _C_FIN + 1         # running VIX min (validity gate)
_C_VMAX = _C_VMIN + 1        # running VIX max
_C_RHI = _C_VMAX + 1         # regime-1 day count
NSTATE_COMPOSE = _C_RHI + 1
# Ring capacities (powers of two > the largest lag they serve).
_RW_X, _RW_SPY, _RW_P, _RW_S20 = 64, 128, 256, 8
# Scoped-VMEM geometry (trace-time; swept by scripts/profile_db_sweep.py).
# The Mosaic default scoped limit (16 MB) forces day_block ~8 at sub=32 —
# the signal rings (7.3 MB) eat most of a 12 MB stream budget, so a 30y
# chunk runs ~945 grid programs. v5e has 128 MB of physical VMEM: raising
# the limit lets the streamed day blocks grow (fewer programs, bigger
# DMAs, a full-size hoisted-draw pass). Hardware sweep at 16384x30y:
# default 154.9 ms -> 133.6 ms at day_block=120 under a 64 MB limit;
# day_block>=252 under 100+ MB fails to compile (Mosaic allocator), so
# _DB_CAP pins the block at the largest measured-good size. Outputs are
# bitwise independent of the geometry (multi-block == single-block).
_VMEM_MB: int | None = 64
_BUDGET_MB = 60
_DB_CAP = 120
SQ252 = 15.874507866387544           # sqrt(252)


def _pick_day_block(S: int, n_streams: int, sub: int,
                    requested: int | None = None,
                    scratch_rows: int = 0,
                    budget_mb: int = 12) -> int:
    """Largest divisor of S whose streamed working set (n_streams
    double-buffered [day_block, sub, 128] f32 blocks) fits the VMEM left
    over after ``scratch_rows`` of persistent [sub, 128] f32 scratch
    (state + signal rings — at sub=32 the rings alone are ~7 MB, so the
    stream budget must shrink with the scratch, not be a constant).
    Grid programs carry fixed DMA/bookkeeping cost: the old halving
    fallback collapsed to day_block=8 for any S = 8 * odd (every 30y
    horizon: 7560 = 8 * 945), running 15k programs per chunk where ~1k
    suffice; trading-day horizons are highly composite, so a near-cap
    divisor always exists (168 | 7560, 2520, 504). An explicit
    ``requested`` acts as an additional cap."""
    row_bytes = sub * _LANES * 4
    budget = budget_mb * 1024 * 1024 - scratch_rows * row_bytes
    cap = max(1, min(budget // (n_streams * row_bytes * 2), _DB_CAP))
    if requested is not None:
        cap = min(cap, requested)
    cap = min(cap, S)
    return max(d for d in range(1, cap + 1) if S % d == 0)


def _f(mask):
    """bool tile -> 0/1 f32 mask (NaN compares are already False)."""
    return mask.astype(jnp.float32)


_ASEL_FMA = False            # perf experiment hook (profile_sub_sweep.py)

# Hoist the fused-compose mode's per-day draws (2 stress normals, the
# jump uniform, the stress t5, and the four TE Student-t draws) out of
# the serial day loop: they are pure functions of (lane, day), so each
# grid program computes the whole day block's draws in one vectorized
# pass into VMEM scratch and the recurrence loop reads them back.
# Bitwise-identical values; costs 8 scratch rows per block day (the
# day-block budget accounts for it in pallas_compose_strategies_run).
_HOIST_DRAWS = True


def _asel(m, a, b):
    """Arithmetic select for FINITE operands: m*a + (1-m)*b.

    The FMA form b + m*(a-b) is 2 VPU ops instead of up to 4; it is
    ulp-DIFFERENT (reassociation), so it ships only if the hardware
    sweep shows a real win AND the parity gates hold — toggle via
    _ASEL_FMA at trace time (clear jit caches after flipping)."""
    if _ASEL_FMA:
        return b + m * (a - b)
    return m * a + (1.0 - m) * b


def _bsel(m, a, b):
    """Bitwise select, safe when a or b holds NaN. m: 0/1 f32 mask."""
    mi = (-m.astype(jnp.int32))                      # 0 / -1
    ai = pltpu.bitcast(a, jnp.int32)
    bi = pltpu.bitcast(b, jnp.int32)
    return pltpu.bitcast((ai & mi) | (bi & ~mi), jnp.float32)


def _guard(v, eps, default):
    """(mask, safe_v): mask=1 where v is finite and >= eps; safe_v
    replaces bad lanes by `default` (bitwise, NaN-proof).

    Matches jnp.where(isnan(v) | (v < eps), default, v): NaN >= eps is
    False, so the complement mask is exactly (v >= eps)."""
    m = _f(v >= eps)
    full = jnp.full_like(v, default)
    return m, _bsel(m, v, full)


def _strategy_kernel(cf_ref, *refs, day_block: int, n_blocks: int,
                     apply_costs: bool, has_cashflows: bool,
                     consts: dict, sub: int, fused_signals: bool = False,
                     fused_compose: bool = False, und_idx=None):
    """One (trial-tile, day-block) program.

    cf_ref: [S] f32 cashflow schedule (SMEM; zeros when has_cashflows is
    False — the adds are skipped statically then).
    refs: NCH input channel refs ([1, day_block, 8, 128] f32 each),
    then out_ref [1, 64, 8, 128] f32, then state scratch
    [NSTATE, 8, 128] f32.

    fused_signals=True: only the first 7 channels (r_tqqq..vix) are
    consumed; the 16 rolling signals are computed IN-KERNEL from ring
    buffers + running window sums (exact add/subtract window sums;
    pandas min_periods NaN structure via bitwise selects), and the
    additional refs are the 4 ring scratch buffers. Eliminates the
    15 [B, S] signal tensors and their separate XLA pass entirely.

    fused_compose=True (implies in-kernel signals): the refs are instead
    (seed, stress-params, asset-params, ids, then the six windowed
    market slabs spy/qqq/tlt/vix/irx/regime) and the kernel ALSO runs
    the cost composition — stress + crisis jumps + funding spread +
    leverage/expense/financing + tracking error with counter-based
    in-kernel draws (ops/pallas_compose.py's math) plus the per-day
    repair pass — so the six etf return series and the cash series
    never exist in HBM either. Summary accumulators (etf finiteness,
    jump count, liq/cred sums) leave via extra output rows.
    """
    if fused_compose:
        # seed/params/ids ahead of the 6 windowed market channels
        # (spy, qqq, tlt, vix, irx, regime).
        seed_ref, sp_ref, ap_ref, ids_ref = refs[:4]
        ch_refs = refs[4:10]
        out_ref = refs[10]
        state = refs[11]
        ring_x, ring_spy, ring_p, ring_s20 = refs[12:16]
        draw_ref = refs[16] if len(refs) > 16 else None
    else:
        n_ch = 7 if fused_signals else NCH
        ch_refs = refs[:n_ch]
        out_ref = refs[n_ch]
        state = refs[n_ch + 1]
        if fused_signals:
            ring_x, ring_spy, ring_p, ring_s20 = refs[n_ch + 2:n_ch + 6]
    j = pl.program_id(1)

    IC = consts["initial_capital"]
    SP0, SP1 = consts["spread_bps0"], consts["spread_bps1"]
    RCPD = consts["rebalance_cost"]
    TQQQ_LEV = consts["tqqq_lev"]
    L6A, L6B = consts["s6_lev_a"], consts["s6_lev_b"]
    W6A, W6B = 0.6, 0.4

    nan_tile = jnp.full((sub, _LANES), jnp.nan, jnp.float32)

    @pl.when(j == 0)
    def _():
        zeros = jnp.zeros((sub, _LANES), jnp.float32)
        for i in range(NS):
            state[_EQ + i] = zeros + IC
            state[_PA + i] = zeros
            state[_TR + i] = zeros
            state[_RM + i] = zeros + IC
            state[_DD + i] = zeros
        state[_POS4] = zeros
        state[_POS5] = zeros
        state[_POS8] = zeros + _POS_CASH
        state[_S6P0] = zeros + IC * W6A
        state[_S6P1] = zeros + IC * W6B
        state[_S6E0] = zeros + L6A
        state[_S6E1] = zeros + L6B
        state[_PVIX] = nan_tile
        for i in range(_NSIG):
            state[_PSIG + i] = nan_tile
        if fused_signals or fused_compose:
            for i in range(NSTATE, NSTATE_FUSED):
                state[i] = zeros
            ring_x[...] = jnp.zeros((_RW_X, sub, _LANES), jnp.float32)
            ring_spy[...] = jnp.zeros((_RW_SPY, sub, _LANES), jnp.float32)
            ring_p[...] = jnp.zeros((_RW_P, sub, _LANES), jnp.float32)
            ring_s20[...] = jnp.zeros((_RW_S20, sub, _LANES), jnp.float32)
        if fused_compose:
            for i in range(NSTATE_FUSED, NSTATE_COMPOSE):
                state[i] = zeros
            state[_C_FIN] = zeros + 1.0
            state[_C_VMIN] = zeros + jnp.inf
            state[_C_VMAX] = zeros - jnp.inf

    if fused_compose:
        from letf_tpu.ops.pallas_compose import (
            _DAY_PRIME,
            _STRESS_IDX,
            _TE_DFS,
            _TE_IDX,
            _normals,
            _t_polar,
            _uniforms,
        )
        from letf_tpu.ops.pallas_joint import _GOLD, _mix

        _s0 = seed_ref[0].astype(jnp.uint32)
        _s1 = seed_ref[1].astype(jnp.uint32)
        _ids_u = pltpu.bitcast(ids_ref[0], jnp.uint32)
        _lane_key = _mix(_ids_u * _GOLD ^ _s0)
        # Only the four assets the strategies consume (TQQQ/SPY/SSO/TMF)
        # get TE chains — see the day body's TE section.
        needed = sorted({consts["idx_tqqq"], consts["idx_spy"],
                         consts["idx_sso"], consts["idx_tmf"]})

        if draw_ref is not None:
            # ---- vectorized draw pass for the whole day block (bitwise
            # equal to the per-day computations — same elementwise
            # instructions at [day_block, sub, 128] granularity).
            # Channel-major rows: c*day_block + d for
            # c in (n_liq, n_cred, u_jump, t5, t_te[needed[0..3]]). ----
            _days = (j * day_block + jax.lax.broadcasted_iota(
                jnp.int32, (day_block, sub, _LANES), 0)).astype(jnp.uint32)
            _dkeys = _mix(_lane_key[None] ^ (_days * _DAY_PRIME) ^ _s1)
            _nl, _nc = _normals(_dkeys, _STRESS_IDX, 2)
            (_uj,) = _uniforms(_dkeys, _STRESS_IDX + 4, 1)
            _t5 = _t_polar(_dkeys, _STRESS_IDX + 2, 5.0)
            for c, blkv in enumerate((_nl, _nc, _uj, _t5)):
                draw_ref[c * day_block:(c + 1) * day_block] = blkv
            for k, a in enumerate(needed):
                draw_ref[(4 + k) * day_block:(5 + k) * day_block] = (
                    _t_polar(_dkeys, _TE_IDX + 2 * a, float(_TE_DFS[a])))

    def day(d, first: bool):
        """One day step, with the day-0 case STATICALLY specialized:
        `first` is a Python bool, so the first=False body (every day but
        one) carries none of the day-0 blend ops (the old traced ff/nf
        scalars cost ~200 tile-ops/day across 19 strategies' equity/
        running-max/prev-allocation day-0 selects), and the first=True
        body constant-folds most of the strategy section away. The two
        variants are dispatched per day by scalar pl.when branches in
        `body` below — the false region's vector ops are skipped at
        runtime, not masked."""
        t = j * day_block + d

        def ch(name):
            return ch_refs[_CI[name]][0, d]

        def prev(name):
            """shift(1) read: yesterday's channel value (NaN on day 0 —
            the scratch rows are NaN-initialized)."""
            return state[_PSIG + _CI[name] - 7]

        if fused_compose:
            # ---- in-kernel cost composition (ops/pallas_compose.py's day
            # body, accumulating into LOCALS instead of etf output refs;
            # same counter-based draw streams, so results match the
            # standalone compose kernel) ----
            from letf_tpu.ops.pallas_compose import _EMA_ALPHA

            def drw(c):
                return draw_ref[pl.ds(c * day_block + d, 1)][0]

            spy_w = ch_refs[0][0, d]
            qqq_w = ch_refs[1][0, d]
            tlt_w = ch_refs[2][0, d]
            vix = ch_refs[3][0, d]
            irx = ch_refs[4][0, d]
            reg = ch_refs[5][0, d]                  # 0/1 f32

            # Validity summaries, accumulated in-kernel (the channels are
            # already in VMEM — the old post-kernel XLA reductions paid
            # 4 extra HBM passes over the windowed slabs): VIX range for
            # the reference's layer gate (engine.py:206-231), tlt/vix
            # finiteness folded into the path-finite flag below, and the
            # regime-1 day count.
            state[_C_VMIN] = jnp.minimum(state[_C_VMIN], vix)
            state[_C_VMAX] = jnp.maximum(state[_C_VMAX], vix)
            state[_C_RHI] = state[_C_RHI] + reg

            def SPr(i):
                return sp_ref[i, 0], sp_ref[i, 1]

            def g2(idx):
                a, b = SPr(idx)
                return a + (b - a) * reg

            (LIQ_MU, LIQ_PHI, LIQ_SIG, CRED_MU, CRED_PHI, CRED_SIG,
             JP_BASE, JP_SCALE, CASH_RATE) = range(9)
            (C_LEV, C_ER, C_BETA, C_FSPREAD, C_RHO, C_SQ, C_TE_SCALE,
             C_DOWNSIDE, C_CLIP) = range(9)
            (F_BASE, F_BVIX, F_BINV, F_BLIQ, F_BCRED, F_MIN,
             F_MAX) = range(9, 16)

            if draw_ref is None:
                su = jnp.uint32(1) * t.astype(jnp.uint32)
                day_key = _mix(_lane_key ^ (su * _DAY_PRIME) ^ _s1)
                n_liq, n_cred = _normals(day_key, _STRESS_IDX, 2)
                (u_jump,) = _uniforms(day_key, _STRESS_IDX + 4, 1)
            else:
                n_liq, n_cred, u_jump = drw(0), drw(1), drw(2)

            liq = state[_C_LIQ]
            cred = state[_C_CRED]
            lmu, cmu = g2(LIQ_MU), g2(CRED_MU)
            if first:
                liq_n, cred_n = lmu, cmu
                jump_on = jnp.zeros_like(vix)
            else:
                liq_n = jnp.clip(lmu + g2(LIQ_PHI) * (liq - lmu)
                                 + g2(LIQ_SIG) * n_liq, 0.0, 3.0)
                cred_n = jnp.clip(cmu + g2(CRED_PHI) * (cred - cmu)
                                  + g2(CRED_SIG) * n_cred, 0.0, 3.0)
            vix_amp = jnp.maximum((vix - 25.0) / 30.0, 0.0)
            pjump = jnp.clip(g2(JP_BASE) + 0.008 * vix_amp + 0.003 * liq_n,
                             0.0, 0.01)
            # Signed polar t replaces |t| * Rademacher(u_sign): sign(cos)
            # is an independent fair coin, so the joint law is unchanged
            # and one uniform draw per day disappears (mirrors
            # ops/pallas_compose.py — the two kernels must stay
            # draw-identical for the slab parity gate).
            t5 = (drw(3) if draw_ref is not None
                  else _t_polar(day_key, _STRESS_IDX + 2, 5.0))
            if not first:
                jump_on = (u_jump < pjump).astype(jnp.float32)
            signed_jump = jump_on * t5 * g2(JP_SCALE)
            spy_a = jnp.clip(spy_w - signed_jump, -0.95, 3.0)
            qqq_a = jnp.clip(qqq_w - 1.12 * signed_jump, -0.95, 4.0)
            state[_C_JC] = state[_C_JC] + jump_on
            state[_C_LS] = state[_C_LS] + liq_n
            state[_C_CS] = state[_C_CS] + cred_n
            state[_C_LIQ] = liq_n
            state[_C_CRED] = cred_n

            risk_free = jnp.clip(irx, 0.0, 20.0) / 100.0
            term = 1.25 - 1.1 * jnp.clip(cred_n, 0.0, 3.0)
            inv_curve = jnp.maximum(-term, 0.0)
            stress_v = jnp.maximum(vix - 20.0, 0.0)
            spread = (sp_ref[F_BASE, 0] + sp_ref[F_BVIX, 0] * stress_v
                      + sp_ref[F_BINV, 0] * inv_curve
                      + sp_ref[F_BLIQ, 0] * jnp.clip(liq_n, 0.0, 3.0)
                      + sp_ref[F_BCRED, 0] * jnp.clip(cred_n, 0.0, 3.0))
            spread = jnp.clip(spread, sp_ref[F_MIN, 0], sp_ref[F_MAX, 0])

            streams = (spy_a, qqq_a, tlt_w)
            vix_mult = jnp.clip(jnp.sqrt(vix / 20.0), 0.5, 1.5)
            regime_mult = 1.0 + 0.15 * reg
            # Only the four assets the strategies actually consume (TQQQ,
            # SPY, SSO, TMF) get their TE chains computed — UPRO and QQQ
            # never feed a strategy channel. Each asset's draws keep
            # their ABSOLUTE stream indices (_TE_IDX + 2a), so computed
            # assets' bits are identical to the all-six kernel; ~1/3 of
            # the per-day Box-Muller + chi-Chebyshev work disappears.
            # (The etf-finite summary accordingly covers these four; the
            # skipped assets' returns are clips of the same finite
            # inputs, so path validity is unchanged in practice.)
            etf_all = {}
            fin_day = _f(jnp.isfinite(tlt_w)) * _f(jnp.isfinite(vix))
            for k_a, a in enumerate(needed):
                und = streams[und_idx[a]] * ap_ref[C_BETA, a]
                lev = ap_ref[C_LEV, a]
                borrow = (jnp.maximum(lev - 1.0, 0.0)
                          * jnp.maximum(risk_free + spread, 0.0) / 252.0)
                lev_ret = lev * und - ap_ref[C_ER, a] / 252.0 - borrow
                t_a = (drw(4 + k_a) if draw_ref is not None else
                       _t_polar(day_key, _TE_IDX + 2 * a, float(_TE_DFS[a])))
                negu = (und < 0).astype(jnp.float32)
                move = ((1.0 + 0.3 * jnp.abs(und))
                        * (ap_ref[C_DOWNSIDE, a] * negu
                           + 0.98 * (1.0 - negu)))
                innov_te = (t_a * ap_ref[C_TE_SCALE, a] * vix_mult
                            * regime_mult)
                if first:
                    te_n = jnp.zeros_like(und)
                else:
                    te_n = (ap_ref[C_RHO, a] * state[_C_TE + a]
                            + ap_ref[C_SQ, a] * innov_te * move)
                bias_n = (_EMA_ALPHA * te_n
                          + (1.0 - _EMA_ALPHA) * state[_C_BIAS + a])
                cap = ap_ref[C_CLIP, a]
                safe = jnp.maximum(cap, 1e-6)
                raw = te_n - bias_n
                mclip = (cap > 0).astype(jnp.float32)
                te_out = (mclip * (safe * jnp.tanh(raw / safe))
                          + (1.0 - mclip) * raw)
                etf = lev_ret + te_out
                # per-day repair (twin of _finish_path): bound and zero
                # non-finite returns; track path-level finiteness.
                fin_a = _f(jnp.isfinite(etf))
                fin_day = fin_day * fin_a
                etf = jnp.clip(_bsel(fin_a, etf, jnp.zeros_like(etf)),
                               -0.999, 10.0)
                etf_all[a] = etf
                state[_C_TE + a] = te_n
                state[_C_BIAS + a] = bias_n
            state[_C_FIN] = state[_C_FIN] * fin_day

            r_tqqq = etf_all[consts["idx_tqqq"]]
            r_spy = etf_all[consts["idx_spy"]]
            r_sso = etf_all[consts["idx_sso"]]
            r_tmf = etf_all[consts["idx_tmf"]]
            cashr = g2(CASH_RATE) / 252.0
        else:
            r_tqqq = ch("r_tqqq")
            r_spy = ch("r_spy")
            r_sso = ch("r_sso")
            r_tmf = ch("r_tmf")
            cashr = ch("cash")
            reg = ch("regime")                   # 0/1 f32
            vix = ch("vix")
        vix_prev = state[_PVIX]
        pp = prev("spy_price")                   # NaN on day 0

        if fused_signals or fused_compose:
            # ---- in-kernel rolling signals (today's values) ----
            if first:
                price = jnp.full_like(r_spy, 100.0) * (1.0 + r_spy)
            else:
                price = state[_PSIG] * (1.0 + r_spy)
            x = r_tqqq
            neg = jnp.minimum(x, 0.0)

            def rd(ring, W, lag):
                return ring[pl.ds((t - lag) & (W - 1), 1)][0]

            def leave(lag):
                """Scalar 0/1: the element leaving the window exists."""
                return jnp.float32(1.0) * (t >= lag).astype(jnp.float32)

            x5, x10, x20, x60 = (rd(ring_x, _RW_X, L)
                                 for L in (5, 10, 20, 60))
            spy126 = rd(ring_spy, _RW_SPY, 126)
            p100 = rd(ring_p, _RW_P, 100)
            p200 = rd(ring_p, _RW_P, 200)
            p14 = rd(ring_p, _RW_P, 14)
            p15 = rd(ring_p, _RW_P, 15)
            s20l5 = rd(ring_s20, _RW_S20, 5)

            def upd(row, add, sub_v, lag):
                v = state[row] + add - leave(lag) * sub_v
                state[row] = v
                return v

            s1_5 = upd(_S1_5, x, x5, 5)
            s2_5 = upd(_S2_5, x * x, x5 * x5, 5)
            s1_10 = upd(_S1_10, x, x10, 10)
            s2_10 = upd(_S2_10, x * x, x10 * x10, 10)
            s1_20 = upd(_S1_20, x, x20, 20)
            s2_20 = upd(_S2_20, x * x, x20 * x20, 20)
            s1_60 = upd(_S1_60, x, x60, 60)
            s2_60 = upd(_S2_60, x * x, x60 * x60, 60)
            s3_60 = upd(_S3_60, x * x * x, x60 * x60 * x60, 60)
            ng20 = jnp.minimum(x20, 0.0)
            n1_20 = upd(_N1_20, neg, ng20, 20)
            n2_20 = upd(_N2_20, neg * neg, ng20 * ng20, 20)
            spy1_126 = upd(_SPY1_126, r_spy, spy126, 126)
            p1_100 = upd(_P1_100, price, p100, 100)
            p1_200 = upd(_P1_200, price, p200, 200)
            # RSI deltas: delta[0] = 0 by construction, so the element
            # leaving at t == 14 is 0 and ring subtraction starts at 15.
            delta = (jnp.zeros_like(price) if first
                     else price - state[_PSIG])
            sub_d = leave(15) * (p14 - p15)
            g1_14 = upd(_G1_14, jnp.maximum(delta, 0.0),
                        jnp.maximum(sub_d, 0.0), 0)
            l1_14 = upd(_L1_14, jnp.maximum(-delta, 0.0),
                        jnp.maximum(-sub_d, 0.0), 0)

            tn = t.astype(jnp.float32) + 1.0              # scalar count

            def okm(min_t):
                """Scalar 0/1 min_periods gate: valid from day min_t on."""
                return jnp.float32(1.0) * (t >= min_t).astype(jnp.float32)

            def nn(w):
                return jnp.minimum(tn, jnp.float32(w))

            def wstd(s1, s2, w, min_t):
                n = nn(w)
                mean = s1 / n
                var = (jnp.maximum(s2 - n * mean * mean, 0.0)
                       / jnp.maximum(n - 1.0, 1.0))
                return _bsel(jnp.full_like(s1, okm(min_t)),
                             jnp.sqrt(var) * SQ252, nan_tile)

            cur = {}
            cur["std5"] = wstd(s1_5, s2_5, 5, 1)
            cur["std10"] = wstd(s1_10, s2_10, 10, 1)
            cur["std20"] = wstd(s1_20, s2_20, 20, 1)
            cur["std60"] = wstd(s1_60, s2_60, 60, 1)
            cur["std20_mp20"] = wstd(s1_20, s2_20, 20, 19)
            cur["dstd20"] = wstd(n1_20, n2_20, 20, 1)
            cur["dstd20_mp20"] = wstd(n1_20, n2_20, 20, 19)
            n60 = nn(60)
            mean60 = s1_60 / n60
            cur["mean60"] = mean60 * 252.0
            m2 = jnp.maximum(s2_60 - n60 * mean60 * mean60, 0.0)
            m3 = (s3_60 - 3.0 * mean60 * s2_60
                  + 2.0 * n60 * mean60 * mean60 * mean60)
            var60 = m2 / jnp.maximum(n60 - 1.0, 1.0)
            sd60 = jnp.sqrt(var60)
            denom = (jnp.maximum(n60 - 1.0, 1.0)
                     * jnp.maximum(n60 - 2.0, 1.0) * sd60 * sd60 * sd60)
            skew_ok = okm(2) * _f(sd60 > 0.0)
            cur["skew60"] = _bsel(
                skew_ok, n60 * m3 / jnp.maximum(denom, 1e-37), nan_tile)
            cur["volmom5"] = _bsel(
                jnp.full_like(s1_5, okm(5)),
                cur["std20"] / s20l5 - 1.0, nan_tile)
            cur["sum126"] = spy1_126
            cur["sma200_mp1"] = p1_200 / nn(200)
            cur["sma200"] = _bsel(jnp.full_like(s1_5, okm(199)),
                                  p1_200 / nn(200), nan_tile)
            cur["sma100_mp1"] = p1_100 / nn(100)
            rs = g1_14 / l1_14
            cur["rsi14"] = _bsel(jnp.full_like(s1_5, okm(13)),
                                 100.0 - 100.0 / (1.0 + rs), nan_tile)
            cur["spy_price"] = price

        eq = [state[_EQ + i] for i in range(NS)]
        pa = [state[_PA + i] for i in range(NS)]

        rets = [None] * NS
        traded = [None] * NS                     # 0/1 f32 masks
        pa_new = [None] * NS

        # ---- S1-S3 benchmarks ----
        for i, rb in enumerate((r_tqqq, r_spy, r_sso)):
            rets[i] = rb
            traded[i] = jnp.zeros_like(rb)
            pa_new[i] = pa[i]

        # ---- S4/S5 SMA state machines ----
        pos4 = state[_POS4]
        pos5 = state[_POS5]
        if first:
            new4, new5 = pos4, pos5
            flip4 = jnp.zeros_like(pos4)
            flip5 = flip4
        else:
            sma1 = prev("sma200_mp1")
            buy4 = _f(pp >= sma1)                # NaN-safe: NaN -> 0
            sell4 = _f(pp < sma1)
            in4 = _f(pos4 == 1.0)
            new4 = _asel(in4, 1.0 - sell4, buy4)     # finite operands
            flip4 = _f(new4 != pos4)

            thresh5 = sma1 * (1.0 - 0.02)
            buy5 = _f(pp >= thresh5)
            sell5 = _f(pp < thresh5)
            in5 = _f(pos5 == 1.0)
            new5 = _asel(in5, 1.0 - sell5, buy5)
            flip5 = _f(new5 != pos5)

        sma_cost = ((SP0 + (SP1 - SP0) * reg) / 10000.0
                    + RCPD * TQQQ_LEV * jnp.abs(r_tqqq))
        for i, (newp, flip) in enumerate(((new4, flip4), (new5, flip5))):
            ret_s = _asel(newp, r_tqqq, cashr)
            if apply_costs:
                ret_s = ret_s - flip * sma_cost
            rets[3 + i] = ret_s
            traded[3 + i] = flip
            pa_new[3 + i] = pa[3 + i]

        # ---- S6 60/40 TQQQ/TMF with leverage-drift turnover ----
        s6p0, s6p1 = state[_S6P0], state[_S6P1]
        s6e0, s6e1 = state[_S6E0], state[_S6E1]
        pg0 = s6p0 * (1.0 + r_tqqq)
        pg1 = s6p1 * (1.0 + r_tmf)
        u6a, u6b = r_tqqq / L6A, r_tmf / L6B
        den_a, den_b = 1.0 + L6A * u6a, 1.0 + L6B * u6b
        emb0 = _asel(_f(jnp.abs(den_a) > 0.01),
                     L6A * (1.0 + u6a) / _bsel(_f(jnp.abs(den_a) > 0.01),
                                               den_a,
                                               jnp.full_like(den_a, 1.0)),
                     jnp.full_like(den_a, L6A))
        emb1 = _asel(_f(jnp.abs(den_b) > 0.01),
                     L6B * (1.0 + u6b) / _bsel(_f(jnp.abs(den_b) > 0.01),
                                               den_b,
                                               jnp.full_like(den_b, 1.0)),
                     jnp.full_like(den_b, L6B))
        total6 = pg0 + pg1
        reb = ((t % 21) == 0) & (t > 0)
        rebf = jnp.float32(1.0) * reb.astype(jnp.float32)   # scalar 0/1
        inv_t6 = 1.0 / jnp.maximum(total6, 1e-30)
        cw0, cw1 = pg0 * inv_t6, pg1 * inv_t6
        w_turn = jnp.abs(cw0 - W6A) + jnp.abs(cw1 - W6B)
        lev_turn = (jnp.abs(emb0 - L6A) / L6A * cw0
                    + jnp.abs(emb1 - L6B) / L6B * cw1)
        tot_turn = w_turn + lev_turn
        if apply_costs:
            do_cost = rebf * _f(tot_turn > 0.01)
        else:
            do_cost = jnp.zeros_like(tot_turn)
        total_after = _asel(do_cost, total6 * (1.0 - tot_turn * RCPD),
                            total6)
        if first:
            s6p0n, s6p1n, s6e0n, s6e1n = s6p0, s6p1, s6e0, s6e1
            equity6 = eq[5]
            traded[5] = jnp.zeros_like(pg0)
        else:
            s6p0n = _asel(jnp.full_like(pg0, rebf), total_after * W6A, pg0)
            s6p1n = _asel(jnp.full_like(pg1, rebf), total_after * W6B, pg1)
            s6e0n = _asel(jnp.full_like(emb0, rebf),
                          jnp.full_like(emb0, L6A), emb0)
            s6e1n = _asel(jnp.full_like(emb1, rebf),
                          jnp.full_like(emb1, L6B), emb1)
            equity6 = total_after
            traded[5] = jnp.full_like(pg0, rebf)
        rets[5] = jnp.zeros_like(pg0)            # placeholder
        pa_new[5] = pa[5]

        def vol_family(i, alloc, include_cash=True,
                       threshold=_TURNOVER_EPS):
            """Common turnover/cost/return machinery (S7, S9-S18).
            alloc must be finite. Returns (ret, traded_mask)."""
            turnover = jnp.abs(alloc - pa[i])
            tr = _f(turnover > threshold)
            if include_cash:
                ret = alloc * r_tqqq + (1.0 - alloc) * cashr
            else:
                ret = alloc * r_tqqq
            if apply_costs:
                ret = ret - tr * turnover * _SPREAD
            return ret, tr

        # ---- S7 vol targeting 20% (NO cash on idle fraction) ----
        std20_mp20_cur = (cur["std20_mp20"]
                          if (fused_signals or fused_compose)
                          else ch("std20_mp20"))       # unshifted read
        m7, v7 = _guard(std20_mp20_cur, 0.01, 1.0)
        pos7 = _asel(m7, jnp.clip(0.20 / v7, 0.2, 2.0),
                     jnp.full_like(v7, 1.0))
        rets[6], traded[6] = vol_family(6, pos7, include_cash=False)
        pa_new[6] = pos7

        # ---- S8 composite regime (TQQQ / SPY / cash; NO costs) ----
        pos8 = state[_POS8]
        if first:
            target8 = pos8
            rets[7] = jnp.zeros_like(pos8)
            traded[7] = jnp.zeros_like(pos8)
        else:
            sma8 = prev("sma200")
            rsi8 = prev("rsi14")
            sc = (_f(pp > sma8) + _f((rsi8 > 40.0) & (rsi8 < 80.0))
                  + _f(vix_prev < 25.0))
            target8 = _asel(_f(sc == 3.0), jnp.full_like(sc, _POS_RISKY),
                            _asel(_f(sc == 2.0),
                                  jnp.full_like(sc, _POS_SAFE),
                                  jnp.full_like(sc, _POS_CASH)))
            rets[7] = _asel(_f(target8 == _POS_RISKY), r_tqqq,
                            _asel(_f(target8 == _POS_SAFE), r_spy, cashr))
            traded[7] = _f(target8 != pos8)
        pa_new[7] = pa[7]

        # ---- S9 adaptive vol target (skips NaN days entirely) ----
        v9r = prev("std20_mp20")
        sma9 = prev("sma200")
        ok9 = _f(v9r >= 0.001) * _f(~jnp.isnan(sma9))
        skip9 = 1.0 - ok9
        bull9 = _f(pp > sma9)
        target_v9 = _asel(bull9, jnp.full_like(bull9, 0.35),
                          jnp.full_like(bull9, 0.12))
        v9 = _bsel(ok9, v9r, jnp.full_like(v9r, 1.0))
        alloc9 = jnp.clip(target_v9 / v9, 0.0, 1.0)
        alloc9 = _asel(ok9, alloc9, pa[8])
        ret9, tr9 = vol_family(8, alloc9)
        rets[8] = ret9 * ok9
        traded[8] = tr9 * ok9
        pa_new[8] = alloc9

        # ---- S10 Sortino (downside vol target) ----
        m10, dv10 = _guard(prev("dstd20_mp20"), 0.001, 1.0)
        alloc10 = _asel(m10, jnp.clip(0.15 / dv10, 0.0, 1.5),
                        jnp.full_like(dv10, 1.0))
        rets[9], traded[9] = vol_family(9, alloc10)
        pa_new[9] = alloc10

        # ---- S11 hyper-convex ----
        _, v11 = _guard(prev("std20"), 0.001, 0.5)
        alloc11 = 0.25 / v11
        bull11 = _f(pp > prev("sma200_mp1"))
        alloc11 = _asel(bull11, alloc11 ** 1.2, alloc11)
        alloc11 = jnp.clip(alloc11, 0.0, 1.0)
        rets[10], traded[10] = vol_family(10, alloc11)
        pa_new[10] = alloc11

        # ---- S12 vol velocity (max of fast/slow vols) ----
        v12r = jnp.maximum(prev("std20"), prev("std5"))   # NaN -> NaN? see
        # jnp.maximum propagates NaN like XLA's: max(NaN, x) = NaN on both.
        _, v12 = _guard(v12r, 0.001, 0.5)
        alloc12 = jnp.clip(0.22 / v12, 0.0, 1.0)
        rets[11], traded[11] = vol_family(11, alloc12)
        pa_new[11] = alloc12

        # ---- S13 vol-of-vol momentum ----
        _, v13 = _guard(prev("std20"), 0.001, 0.5)
        vm13 = prev("volmom5")
        alloc13 = 0.25 / v13
        alloc13 = _asel(_f(vm13 < -0.10), alloc13 * 1.2, alloc13)
        alloc13 = _asel(_f(vm13 > 0.10), alloc13 * 0.7, alloc13)
        alloc13 = jnp.clip(alloc13, 0.0, 1.0)
        rets[12], traded[12] = vol_family(12, alloc13)
        pa_new[12] = alloc13

        # ---- S14 skewness-adjusted convex ----
        _, v14 = _guard(prev("std20"), 0.001, 0.5)
        s14 = prev("skew60")
        alloc14 = 0.25 / v14
        alloc14 = _asel(_f(s14 > 0.0), alloc14 ** 1.3, alloc14)
        alloc14 = _asel(_f(s14 < -0.5), alloc14 * 0.5, alloc14)
        alloc14 = jnp.clip(alloc14, 0.0, 1.0)
        rets[13], traded[13] = vol_family(13, alloc14)
        pa_new[13] = alloc14

        # ---- S15 meta-ensemble ----
        _, dv15 = _guard(prev("dstd20"), 0.001, 0.25)
        alloc15 = 0.28 / dv15
        bull15 = _f(pp > prev("sma200_mp1"))
        alloc15 = _asel(bull15, alloc15 ** 1.2, alloc15)
        brake15 = _f(prev("std5") > 1.5 * prev("std20"))
        alloc15 = _asel(brake15, alloc15 * 0.5, alloc15)
        alloc15 = jnp.clip(alloc15, 0.0, 1.0)
        rets[14], traded[14] = vol_family(14, alloc15)
        pa_new[14] = alloc15

        # ---- S16 crisis alpha (regime asymmetric) ----
        vr16 = prev("std5") / prev("std60")
        crisis16 = jnp.minimum(_f(vix > 25.0) + _f(vr16 > 1.5), 1.0)
        target16 = _asel(crisis16, jnp.full_like(vix, 0.08),
                         jnp.full_like(vix, 0.30))
        m16, rv16 = _guard(prev("std5"), 0.001, 1.0)
        alloc16 = _asel(m16, jnp.clip(target16 / rv16, 0.0, 1.2),
                        jnp.full_like(rv16, 0.5))
        rets[15], traded[15] = vol_family(15, alloc16)
        pa_new[15] = alloc16

        # ---- S17 tail-risk optimizer (skew-aware Kelly) ----
        _, vol17 = _guard(prev("std20"), 0.001, 0.25)
        m17b = _f(prev("dstd20") >= 0.001)
        dvol17 = _bsel(m17b, prev("dstd20"), vol17 * 0.6)
        skew17 = _bsel(_f(~jnp.isnan(prev("skew60"))), prev("skew60"),
                       jnp.zeros_like(vol17))
        mean17 = _bsel(_f(~jnp.isnan(prev("mean60"))), prev("mean60"),
                       jnp.full_like(vol17, 0.08))
        sneg5 = _f(skew17 < -0.5)
        sneg0 = _f(skew17 < 0.0)
        spos5 = _f(skew17 > 0.5)
        eff17 = _asel(sneg5, dvol17 * 1.5,
                      _asel(sneg0, dvol17 * 1.2,
                            _asel(spos5, vol17 * 0.9, vol17)))
        pen17 = _asel(sneg5, jnp.full_like(vol17, 0.6),
                      _asel(sneg0, jnp.full_like(vol17, 0.8),
                            _asel(spos5, jnp.full_like(vol17, 1.2),
                                  jnp.full_like(vol17, 1.0))))
        # eff17 > 0 by construction (vol/dvol floors), so the divisions
        # below are finite everywhere — arithmetic selects are safe.
        me17 = _f(eff17 > 0.01)
        kelly17 = _asel(me17,
                        jnp.clip((mean17 - 0.03) / (eff17 * eff17)
                                 * 0.7, 0.2, 2.0),
                        jnp.full_like(eff17, 1.0))
        alloc17 = jnp.clip((0.30 / eff17) * pen17 * (kelly17 / 1.5),
                           0.0, 1.5)
        rets[16], traded[16] = vol_family(16, alloc17)
        pa_new[16] = alloc17

        # ---- S18 momentum-vol convergence ----
        mom18 = _bsel(_f(~jnp.isnan(prev("sum126"))), prev("sum126"),
                      jnp.zeros_like(vix))
        _, vf18 = _guard(prev("std10"), 0.001, 0.30)
        _, vs18 = _guard(prev("std60"), 0.001, 0.25)
        mm18 = _asel(_f(mom18 > 0.05), jnp.full_like(vix, 1.3),
                     _asel(_f(mom18 > 0.0), jnp.full_like(vix, 1.0),
                           jnp.full_like(vix, 0.5)))
        vr18 = vf18 / vs18
        out_band = jnp.minimum(_f(vr18 < 0.8) + _f(vr18 > 1.3), 1.0)
        vm18 = _asel(_f(vr18 < 0.8), jnp.full_like(vix, 1.2),
                     _asel(_f(vr18 > 1.3), jnp.full_like(vix, 0.6),
                           jnp.full_like(vix, 1.0)))
        eff18 = _asel(out_band, vf18, vs18)
        alloc18 = jnp.clip(0.28 * mm18 * vm18 / eff18, 0.0, 1.5)
        rets[17], traded[17] = vol_family(17, alloc18)
        pa_new[17] = alloc18

        # ---- S19 conviction compounder (5% rebalance threshold) ----
        mom19 = _bsel(_f(~jnp.isnan(prev("sum126"))), prev("sum126"),
                      jnp.zeros_like(vix))
        _, dv19 = _guard(prev("dstd20"), 0.001, 0.20)
        _, vf19 = _guard(prev("std5"), 0.001, 0.30)
        _, vs19 = _guard(prev("std60"), 0.001, 0.25)
        mom_score = _asel(_f(mom19 > 0.15), jnp.full_like(vix, 1.0),
                          _asel(_f(mom19 > 0.05), jnp.full_like(vix, 0.7),
                                _asel(_f(mom19 > 0.0),
                                      jnp.full_like(vix, 0.4),
                                      jnp.zeros_like(vix))))
        trend_score = _f(pp > prev("sma100_mp1")) * 0.5
        vr19 = vf19 / vs19
        vol_score = _asel(_f(vr19 < 0.9), jnp.full_like(vix, 0.5),
                          _asel(_f(vr19 < 1.2), jnp.full_like(vix, 0.3),
                                jnp.zeros_like(vix)))
        conviction = mom_score + trend_score + vol_score
        cand19 = jnp.clip((0.32 / dv19) * (0.3 + conviction * 0.55),
                          0.0, 1.5)
        turn19 = jnp.abs(cand19 - pa[18])
        rebal19 = _f(turn19 > 0.05)
        alloc19 = _asel(rebal19, cand19, pa[18])
        ret19 = alloc19 * r_tqqq + (1.0 - alloc19) * cashr
        if apply_costs:
            ret19 = ret19 - rebal19 * turn19 * _SPREAD
        rets[18] = ret19
        traded[18] = rebal19
        pa_new[18] = alloc19

        # ---- combine ----
        eq_new = [None] * NS
        for i in range(NS):
            if first and i >= 3:
                eq_new[i] = eq[i]        # day-0 quirk: loop strategies idle
            else:
                eq_new[i] = eq[i] * (1.0 + rets[i])
        eq_new[5] = equity6
        # Cashflow overlay + ruin floor. The floor applies even with no
        # cashflows (equity can go below zero when a levered daily loss
        # plus costs exceeds -100%) — same as the XLA scan's
        # max(equity + cf, 0) with a zero schedule.
        pre5 = eq_new[5]
        cf = cf_ref[t] if has_cashflows else 0.0
        for i in range(NS):
            eq_new[i] = jnp.maximum(eq_new[i] + cf, 0.0)
        s6_scale = eq_new[5] / jnp.maximum(pre5, 1e-30)
        s6p0n = s6p0n * s6_scale
        s6p1n = s6p1n * s6_scale

        for i in range(NS):
            if first:
                # Day 0: no trades, running max = equity, drawdown 0,
                # prev allocation keeps its init — only EQ/RM move.
                state[_RM + i] = eq_new[i]
                state[_EQ + i] = eq_new[i]
                continue
            tr_i = traded[i]
            if i == 5:
                tr_i = tr_i * 2.0
            state[_TR + i] = state[_TR + i] + tr_i

            rm = state[_RM + i]
            rm_new = jnp.maximum(rm, eq_new[i])
            denom = jnp.maximum(rm_new, 1e-30)
            safe_rm = _asel(_f(rm_new > 0.0), denom,
                            jnp.full_like(rm_new, 1.0))
            dd = (eq_new[i] - rm_new) / safe_rm
            state[_DD + i] = jnp.maximum(state[_DD + i], -dd)
            state[_RM + i] = rm_new
            state[_EQ + i] = eq_new[i]
            state[_PA + i] = pa_new[i]

        if not first:
            state[_POS4] = new4
            state[_POS5] = new5
            state[_POS8] = target8
        state[_S6P0] = s6p0n
        state[_S6P1] = s6p1n
        state[_S6E0] = s6e0n
        state[_S6E1] = s6e1n

        # roll the shift(1) scratch
        state[_PVIX] = vix
        if fused_signals or fused_compose:
            for i, name in enumerate(CHANNELS[7:]):
                state[_PSIG + i] = cur[name]
            ring_x[pl.ds(t & (_RW_X - 1), 1)] = x[None]
            ring_spy[pl.ds(t & (_RW_SPY - 1), 1)] = r_spy[None]
            ring_p[pl.ds(t & (_RW_P - 1), 1)] = price[None]
            ring_s20[pl.ds(t & (_RW_S20 - 1), 1)] = cur["std20"][None]
        else:
            for i in range(_NSIG):
                state[_PSIG + i] = ch_refs[7 + i][0, d]

    def body(d, _):
        is0 = (j == 0) & (d == 0)

        @pl.when(is0)
        def _():
            day(d, True)

        @pl.when(jnp.logical_not(is0))
        def _():
            day(d, False)

        return 0

    jax.lax.fori_loop(0, day_block, body, 0)

    @pl.when(j == n_blocks - 1)
    def _():
        zeros = jnp.zeros((sub, _LANES), jnp.float32)
        for i in range(NS):
            out_ref[0, i] = state[_EQ + i]
            out_ref[0, NS + i] = state[_TR + i]
            out_ref[0, 2 * NS + i] = state[_DD + i]
        if fused_compose:
            # rows 57-63: path-finite flag (etf+tlt+vix), jump count,
            # liq sum, cred sum, vix min, vix max, regime-1 days
            out_ref[0, 3 * NS] = state[_C_FIN]
            out_ref[0, 3 * NS + 1] = state[_C_JC]
            out_ref[0, 3 * NS + 2] = state[_C_LS]
            out_ref[0, 3 * NS + 3] = state[_C_CS]
            out_ref[0, 3 * NS + 4] = state[_C_VMIN]
            out_ref[0, 3 * NS + 5] = state[_C_VMAX]
            out_ref[0, 3 * NS + 6] = state[_C_RHI]
        else:
            for i in range(3 * NS, 64):
                out_ref[0, i] = zeros


def _consts():
    return dict(
        initial_capital=float(cfg.INITIAL_CAPITAL),
        spread_bps0=float(cfg.BASE_SPREAD_BPS[0]),
        spread_bps1=float(cfg.BASE_SPREAD_BPS[1]),
        rebalance_cost=float(cfg.REBALANCE_COST_PER_DOLLAR),
        tqqq_lev=float(cfg.ASSETS["TQQQ"].leverage),
        s6_lev_a=float(cfg.ASSETS["TQQQ"].leverage),
        s6_lev_b=float(cfg.ASSETS["TMF"].leverage),
        idx_tqqq=cfg.ASSET_INDEX["TQQQ"],
        idx_spy=cfg.ASSET_INDEX["SPY"],
        idx_sso=cfg.ASSET_INDEX["SSO"],
        idx_tmf=cfg.ASSET_INDEX["TMF"],
    )


@functools.partial(jax.jit, static_argnames=("apply_costs", "day_block",
                                             "interpret", "sub", "layout",
                                             "fused_signals"))
def pallas_strategies_run(channels, cashflows=None, apply_costs: bool = True,
                          day_block: int | None = None,
                          interpret: bool = False,
                          sub: int = 0, layout: str = "bs",
                          fused_signals: bool = False):
    """channels: [NCH] list/tuple of [B, S] f32 arrays in CHANNELS order —
    or, with layout="slab", already-slabbed [G, S, sub, 128] arrays (the
    slab pipeline's native layout; no transpose staging).
    Returns (final_wealth [B, NS], num_trades [B, NS] int32,
    max_dd [B, NS]).

    ``sub``: sublane height of the per-program trial tile (0 = auto: the
    largest of 32/16/8 dividing B/128). The day loop is a serial chain of
    small VPU ops, so per-op latency dominates at (8, 128); a taller tile
    gives the VPU independent sub-tiles to overlap within each op."""
    if layout == "slab":
        G, S, sub, _ = channels[0].shape
        B = G * sub * _LANES
        ins = [a.astype(jnp.float32) for a in channels]
    else:
        B, S = channels[0].shape
        assert B % TILE == 0, B
        if sub == 0:
            sub = next(h for h in (32, 16, 8) if B % (h * _LANES) == 0)
        G = B // (sub * _LANES)

        def slab(a):
            return (a.astype(jnp.float32).reshape(G, sub, _LANES, S)
                    .transpose(0, 3, 1, 2))

        ins = [slab(a) for a in channels]
    n_ch = 7 if fused_signals else NCH
    _rings = (_RW_X + _RW_SPY + _RW_P + _RW_S20) if fused_signals else 0
    _scr = (NSTATE_FUSED if fused_signals else NSTATE) + _rings + 64
    day_block = _pick_day_block(S, n_ch, sub, day_block, scratch_rows=_scr,
                                budget_mb=_BUDGET_MB)
    NB = S // day_block
    assert len(ins) == n_ch, (len(ins), n_ch)
    has_cf = cashflows is not None
    cf = (jnp.asarray(cashflows, jnp.float32) if has_cf
          else jnp.zeros((S,), jnp.float32))

    blk = pl.BlockSpec((1, day_block, sub, _LANES),
                       lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _strategy_kernel, day_block=day_block, n_blocks=NB,
        apply_costs=apply_costs, has_cashflows=has_cf, consts=_consts(),
        sub=sub, fused_signals=fused_signals)

    scratch = [pltpu.VMEM(
        ((NSTATE_FUSED if fused_signals else NSTATE), sub, _LANES),
        jnp.float32)]
    if fused_signals:
        scratch += [pltpu.VMEM((w, sub, _LANES), jnp.float32)
                    for w in (_RW_X, _RW_SPY, _RW_P, _RW_S20)]

    out = pl.pallas_call(
        kernel,
        grid=(G, NB),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [blk] * n_ch,
        out_specs=pl.BlockSpec((1, 64, sub, _LANES),
                               lambda g, j: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 64, sub, _LANES), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            **({"vmem_limit_bytes": _VMEM_MB * 2**20} if _VMEM_MB else {})),
        interpret=interpret,
    )(cf, *ins)

    flat = out.transpose(0, 2, 3, 1).reshape(B, 64)
    final_wealth = flat[:, :NS]
    num_trades = flat[:, NS:2 * NS].astype(jnp.int32)
    max_dd = flat[:, 2 * NS:3 * NS]
    return final_wealth, num_trades, max_dd


@functools.partial(jax.jit, static_argnames=("sim_days", "apply_costs",
                                             "day_block", "interpret"))
def pallas_compose_strategies_run(sp, ap, base_ids, seed_words,
                                  spy, qqq, tlt, vix, irx, regime,
                                  sim_days: int, cashflows=None,
                                  apply_costs: bool = True,
                                  day_block: int | None = None,
                                  interpret: bool = False):
    """ONE kernel from windowed market slabs to strategy summaries:
    stress + jumps + funding + leverage/TE composition
    (ops/pallas_compose.py's math, same counter-based draw streams),
    then in-kernel rolling signals and all 19 strategies. The six etf
    return tensors, cash series, and 16 signals never exist in HBM.

    Inputs: spy/qqq/tlt/vix/irx/regime are [G, S, 8, 128] windowed slabs
    (regime as f32 0/1); base_ids [B] int32; seed_words [2] int32;
    sp/ap the compose parameter tables.
    Returns (final_wealth [B, NS], num_trades, max_dd,
    path_finite [B] bool (etf + tlt + vix all finite), jump_days [B]
    int32, liq_sum [B], cred_sum [B], vix_min [B], vix_max [B],
    regime_high_days [B] int32) — the validity reductions are
    accumulated in-kernel instead of re-reading the windowed slabs.
    """
    G, S, sub, _ = spy.shape
    B = G * sub * _LANES
    _scr = NSTATE_COMPOSE + _RW_X + _RW_SPY + _RW_P + _RW_S20 + 64
    # Hoisted draws cost 8 scratch rows per block day on top of the 12
    # double-buffered stream rows: account by pretending 10 streams.
    day_block = _pick_day_block(S, 10 if _HOIST_DRAWS else 6, sub,
                                day_block, scratch_rows=_scr,
                                budget_mb=_BUDGET_MB)
    NB = S // day_block
    has_cf = cashflows is not None
    cf = (jnp.asarray(cashflows, jnp.float32) if has_cf
          else jnp.zeros((S,), jnp.float32))
    ids = base_ids.astype(jnp.int32).reshape(G, sub, _LANES)
    und_idx = tuple(int(i) for i in cfg.asset_table().underlying)

    blk = pl.BlockSpec((1, day_block, sub, _LANES),
                       lambda g, j: (g, j, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _strategy_kernel, day_block=day_block, n_blocks=NB,
        apply_costs=apply_costs, has_cashflows=has_cf, consts=_consts(),
        sub=sub, fused_signals=False, fused_compose=True,
        und_idx=und_idx)

    scratch = [pltpu.VMEM((NSTATE_COMPOSE, sub, _LANES), jnp.float32)]
    scratch += [pltpu.VMEM((w, sub, _LANES), jnp.float32)
                for w in (_RW_X, _RW_SPY, _RW_P, _RW_S20)]
    if _HOIST_DRAWS:
        scratch += [pltpu.VMEM((8 * day_block, sub, _LANES), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=(G, NB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # cashflows
            pl.BlockSpec(memory_space=pltpu.SMEM),    # seed words
            pl.BlockSpec(memory_space=pltpu.SMEM),    # stress params
            pl.BlockSpec(memory_space=pltpu.SMEM),    # asset params
            pl.BlockSpec((1, sub, _LANES), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),    # base ids
        ] + [blk] * 6,
        out_specs=pl.BlockSpec((1, 64, sub, _LANES),
                               lambda g, j: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 64, sub, _LANES), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            **({"vmem_limit_bytes": _VMEM_MB * 2**20} if _VMEM_MB else {})),
        interpret=interpret,
    )(cf, seed_words.astype(jnp.int32), sp, ap, ids,
      spy, qqq, tlt, vix, irx, regime)

    flat = out.transpose(0, 2, 3, 1).reshape(B, 64)
    final_wealth = flat[:, :NS]
    num_trades = flat[:, NS:2 * NS].astype(jnp.int32)
    max_dd = flat[:, 2 * NS:3 * NS]
    path_finite = flat[:, 3 * NS] > 0.5       # etf + tlt + vix all finite
    jump_days = flat[:, 3 * NS + 1].astype(jnp.int32)
    liq_sum = flat[:, 3 * NS + 2]
    cred_sum = flat[:, 3 * NS + 3]
    vix_min = flat[:, 3 * NS + 4]
    vix_max = flat[:, 3 * NS + 5]
    regime_high = flat[:, 3 * NS + 6].astype(jnp.int32)
    return (final_wealth, num_trades, max_dd, path_finite, jump_days,
            liq_sum, cred_sum, vix_min, vix_max, regime_high)


def channels_from(path, sig):
    """Build the CHANNELS-ordered [B, S] array list from PathOutputs +
    SignalSet (same sources the XLA scan consumes)."""
    from letf_tpu.strategies.signals import (
        IDX_SPY, IDX_SSO, IDX_TMF, IDX_TQQQ,
    )

    etf = path.etf_ret
    return [
        etf[:, :, IDX_TQQQ], etf[:, :, IDX_SPY], etf[:, :, IDX_SSO],
        etf[:, :, IDX_TMF], path.cash_ret,
        path.regime.astype(jnp.float32), path.vix, sig.spy_price,
        sig.tqqq_std20_mp20, sig.tqqq_dstd20_mp20, sig.tqqq_std5,
        sig.tqqq_std10, sig.tqqq_std20, sig.tqqq_std60, sig.tqqq_dstd20,
        sig.tqqq_skew60, sig.tqqq_mean60_ann, sig.tqqq_volmom5,
        sig.spy_sum126, sig.spy_sma200_mp1, sig.spy_sma200,
        sig.spy_sma100_mp1, sig.spy_rsi14,
    ]

"""Pallas TPU kernel: fused buy-and-hold LETF compounding (the headline path).

BASELINE config #1 ("buy-and-hold 3x GBM, 10k trials x 30y, percentile fan")
and the 1M x 30y north-star run entirely on-chip:

- each grid program owns an (8, 128) tile of trials
- normals come from the per-core PRNG (pltpu.prng_random_bits) via
  Box-Muller — two days consumed per draw pair, no HBM traffic for
  innovations
- the carry (log-wealth accumulator, running peak, max drawdown) lives in
  registers/VMEM; the only HBM writes are three [N] result vectors
- daily relation: w += log1p(L*r - expense/252 - borrow_daily), i.e. the
  exact reference compounding (engine.py:128-154 + utils.py:169-216) with
  volatility drag emerging from geometric accumulation

A pure-XLA twin (gbm_buyhold_xla) provides the correctness oracle and the
CPU fallback; both return (final_wealth, max_drawdown).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 8
_TILE_COLS = 128
TILE = _TILE_ROWS * _TILE_COLS
_TWO_PI = 2.0 * math.pi


def _bits_to_unit(bits):
    """uint32 -> uniform in (0, 1): top 24 bits, offset by half an ulp so
    log() never sees zero. Mosaic lacks a uint32->f32 cast, so the shifted
    bits (< 2^24) are bitcast to int32 first."""
    b24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return b24.astype(jnp.float32) * (1.0 / 16777216.0) + (0.5 / 16777216.0)


def _gbm_kernel(seed_ref, out_w_ref, out_mdd_ref, *, n_days: int,
                mu: float, sigma: float, leverage: float, daily_cost: float):
    # Seed with (seed, tile) as separate words: adjacent seeds must get
    # disjoint streams for every tile (seed s tile i must NOT equal seed
    # s+1 tile i-1, which an additive seed would produce).
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    shape = (_TILE_ROWS, _TILE_COLS)
    n_pairs = (n_days + 1) // 2
    odd_tail = (n_days % 2) == 1

    def body(i, carry):
        acc, peak, mdd = carry
        bits = pltpu.bitcast(pltpu.prng_random_bits((2,) + shape), jnp.uint32)
        u1 = _bits_to_unit(bits[0])
        u2 = _bits_to_unit(bits[1])
        rad = jnp.sqrt(-2.0 * jnp.log(u1))
        ang = _TWO_PI * u2
        z1 = rad * jnp.cos(ang)
        z2 = rad * jnp.sin(ang)

        def step(acc, peak, mdd, z):
            r = mu + sigma * z
            net = leverage * r - daily_cost
            acc = acc + jnp.log1p(jnp.maximum(net, -0.999))
            peak = jnp.maximum(peak, acc)
            mdd = jnp.maximum(mdd, peak - acc)
            return acc, peak, mdd

        acc, peak, mdd = step(acc, peak, mdd, z1)
        # The final odd day uses only z1 of its pair.
        use_z2 = jnp.logical_or(i + 1 < n_pairs,
                                jnp.logical_not(jnp.bool_(odd_tail)))
        acc2, peak2, mdd2 = step(acc, peak, mdd, z2)
        acc = jnp.where(use_z2, acc2, acc)
        peak = jnp.where(use_z2, peak2, peak)
        mdd = jnp.where(use_z2, mdd2, mdd)
        return acc, peak, mdd

    zero = jnp.zeros(shape, jnp.float32)
    acc, _, mdd = jax.lax.fori_loop(0, n_pairs, body, (zero, zero, zero))

    out_w_ref[0] = jnp.exp(acc)
    out_mdd_ref[0] = 1.0 - jnp.exp(-mdd)


@functools.partial(
    jax.jit,
    static_argnames=("n_trials", "n_days", "mu", "sigma", "leverage",
                     "daily_cost", "interpret"))
def gbm_buyhold_pallas(seed: int, n_trials: int, n_days: int,
                       mu: float, sigma: float, leverage: float = 3.0,
                       daily_cost: float = 0.0,
                       interpret: bool = False):
    """Fused buy-and-hold kernel. n_trials must be a multiple of 1024.

    Returns (final_wealth_multiple [N], max_drawdown [N]) in float32.
    """
    assert n_trials % TILE == 0, f"n_trials must be a multiple of {TILE}"
    grid = (n_trials // TILE,)
    kernel = functools.partial(
        _gbm_kernel, n_days=n_days, mu=float(mu), sigma=float(sigma),
        leverage=float(leverage), daily_cost=float(daily_cost))
    out_shape = jax.ShapeDtypeStruct((grid[0], _TILE_ROWS, _TILE_COLS),
                                     jnp.float32)
    w, mdd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, _TILE_ROWS, _TILE_COLS),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_ROWS, _TILE_COLS),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32))
    return w.reshape(n_trials), mdd.reshape(n_trials)


@functools.partial(
    jax.jit,
    static_argnames=("n_trials", "n_days", "mu", "sigma", "leverage",
                     "daily_cost"))
def gbm_buyhold_xla(key, n_trials: int, n_days: int, mu: float, sigma: float,
                    leverage: float = 3.0, daily_cost: float = 0.0):
    """Pure-XLA twin (different RNG stream; identical distribution).
    Scan over days with a [N] carry — the correctness oracle for the kernel
    and the portable fallback."""

    def step(carry, k):
        acc, peak, mdd = carry
        z = jax.random.normal(k, (n_trials,), jnp.float32)
        net = leverage * (mu + sigma * z) - daily_cost
        acc = acc + jnp.log1p(jnp.maximum(net, -0.999))
        peak = jnp.maximum(peak, acc)
        mdd = jnp.maximum(mdd, peak - acc)
        return (acc, peak, mdd), None

    keys = jax.random.split(key, n_days)
    zero = jnp.zeros(n_trials, jnp.float32)
    (acc, _, mdd), _ = jax.lax.scan(step, (zero, zero, zero), keys)
    return jnp.exp(acc), 1.0 - jnp.exp(-mdd)


def gbm_percentile_report(seed: int, n_trials: int, years: int,
                          annual_mu: float = 0.10, annual_sigma: float = 0.24,
                          leverage: float = 3.0, expense_ratio: float = 0.0086,
                          borrow_annual: float = 0.0,
                          use_pallas: bool | None = None):
    """BASELINE config #1/#2 headline: TQQQ-style buy-and-hold percentile
    fan. Returns a dict with wealth percentiles, CAGR percentiles, CVaR(5%),
    and median max drawdown — all reduced on device."""
    from letf_tpu.ops.reductions import PERCENTILES

    n_days = years * 252
    mu = annual_mu / 252.0
    sigma = annual_sigma / math.sqrt(252.0)
    daily_cost = expense_ratio / 252.0 + max(leverage - 1.0, 0.0) * borrow_annual / 252.0

    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        pad = (-n_trials) % TILE
        w, mdd = gbm_buyhold_pallas(seed, n_trials + pad, n_days, mu, sigma,
                                    leverage, daily_cost)
        w, mdd = w[:n_trials], mdd[:n_trials]
    else:
        w, mdd = gbm_buyhold_xla(jax.random.key(seed), n_trials, n_days,
                                 mu, sigma, leverage, daily_cost)

    q = jnp.asarray(PERCENTILES)
    wp = jnp.percentile(w, q)
    n_tail = max(1, int(n_trials * 0.05))
    cvar = jnp.mean(jax.lax.top_k(-w, n_tail)[0]) * -1.0
    out = {
        "percentiles": {f"p{int(p)}": float(v) for p, v in
                        zip(np.asarray(q), np.asarray(wp))},
        "cagr_percentiles": {f"p{int(p)}": float(v ** (1.0 / years) - 1.0)
                             for p, v in zip(np.asarray(q), np.asarray(wp))},
        "cvar_5pct_wealth": float(cvar),
        "median_max_drawdown": float(jnp.median(mdd)),
        "n_trials": n_trials,
        "years": years,
        "engine": "pallas" if use_pallas else "xla",
    }
    return out

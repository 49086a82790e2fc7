"""Shared rolling signals for the strategy scan.

Signals are computed ONCE per path batch on [B, S] arrays (windowed
reductions on the VPU), then consumed by every strategy in the batched
equity scan — replacing the reference's per-strategy pandas rolling
pipelines (letf/strategy.py:98-1175). The shift(1) lags in the reference
are realized by indexing day i-1 inside the scan, so each signal is stored
unshifted.

Naming: <series>_<stat><window>[_mp<min_periods>]; vol stats annualized by
sqrt(252) exactly where the reference annualizes.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from letf_tpu import config as cfg
from letf_tpu.ops import rolling as rl
from letf_tpu.ops.path_engine import PathOutputs

SQ252 = float(np.sqrt(252.0))

# Asset column indices in the simulator's asset axis.
IDX_TQQQ = cfg.ASSET_INDEX["TQQQ"]
IDX_UPRO = cfg.ASSET_INDEX["UPRO"]
IDX_SSO = cfg.ASSET_INDEX["SSO"]
IDX_TMF = cfg.ASSET_INDEX["TMF"]
IDX_SPY = cfg.ASSET_INDEX["SPY"]
IDX_QQQ = cfg.ASSET_INDEX["QQQ"]


class SignalSet(NamedTuple):
    """All [B, S] signal arrays consumed by the strategy scan."""
    prices: jax.Array          # [B, S, A] cumprod(1+r)*100 per asset
    spy_price: jax.Array       # [B, S]
    tqqq_std20_mp20: jax.Array
    tqqq_dstd20_mp20: jax.Array
    tqqq_std5: jax.Array       # min_periods=1 unless _mp noted
    tqqq_std10: jax.Array
    tqqq_std20: jax.Array
    tqqq_std60: jax.Array
    tqqq_dstd20: jax.Array
    tqqq_skew60: jax.Array
    tqqq_mean60_ann: jax.Array
    tqqq_volmom5: jax.Array    # pct_change(5) of tqqq_std20
    spy_sum126: jax.Array
    spy_sma200_mp1: jax.Array
    spy_sma200: jax.Array      # min_periods=200
    spy_sma100_mp1: jax.Array
    spy_rsi14: jax.Array


def compute_signals(path: PathOutputs) -> SignalSet:
    """path arrays are [B, S(, A)] batched outputs of the path engine."""
    etf = path.etf_ret                              # [B, S, A]
    prices = jnp.cumprod(1.0 + etf, axis=1) * 100.0
    spy_price = prices[:, :, IDX_SPY]

    r_tqqq = etf[:, :, IDX_TQQQ]
    r_spy = etf[:, :, IDX_SPY]
    neg_tqqq = jnp.where(r_tqqq < 0, r_tqqq, 0.0)

    return SignalSet(
        prices=prices,
        spy_price=spy_price,
        tqqq_std20_mp20=rl.rolling_std(r_tqqq, 20) * SQ252,
        tqqq_dstd20_mp20=rl.rolling_std(neg_tqqq, 20) * SQ252,
        tqqq_std5=rl.rolling_std(r_tqqq, 5, 1) * SQ252,
        tqqq_std10=rl.rolling_std(r_tqqq, 10, 1) * SQ252,
        tqqq_std20=rl.rolling_std(r_tqqq, 20, 1) * SQ252,
        tqqq_std60=rl.rolling_std(r_tqqq, 60, 1) * SQ252,
        tqqq_dstd20=rl.rolling_std(neg_tqqq, 20, 1) * SQ252,
        tqqq_skew60=rl.rolling_skew(r_tqqq, 60, 1),
        tqqq_mean60_ann=rl.rolling_mean(r_tqqq, 60, 1) * 252.0,
        tqqq_volmom5=rl.pct_change(rl.rolling_std(r_tqqq, 20, 1) * SQ252, 5),
        spy_sum126=rl.rolling_sum(r_spy, 126, 1),
        spy_sma200_mp1=rl.rolling_mean(spy_price, 200, 1),
        spy_sma200=rl.rolling_mean(spy_price, 200),
        spy_sma100_mp1=rl.rolling_mean(spy_price, 100, 1),
        spy_rsi14=rl.rsi(spy_price, 14),
    )

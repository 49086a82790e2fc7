"""Borrow-cost math, drawdown helpers, and dynamic-factor backfill.

Parity targets: calculate_daily_borrow_cost (letf/utils.py:169-216),
get_borrow_cost_series (letf/utils.py:219-251),
get_max_underwater_days (letf/utils.py:25-40),
fill_missing_with_dynamic_factor (letf/utils.py:130-162).

The per-day borrow cost is a pure elementwise expression, so inside the
simulator it is fused directly into the path kernel; the scalar/series
functions here serve calibration and host-side analysis.
"""

from __future__ import annotations

import numpy as np


def calculate_daily_borrow_cost(leverage: float, risk_free_rate: float,
                                spread: float) -> float:
    """Daily financing drag of an Lx fund: (L-1) * max(rf + spread, 0) / 252.

    A 3x fund borrows 2x its capital; a 1x fund borrows nothing. Rates are
    annual decimals; the result is a daily decimal.
    """
    borrowed = leverage - 1.0
    if borrowed <= 0:
        return 0.0
    annual = borrowed * max(risk_free_rate + spread, 0.0)
    return annual / 252.0


def get_borrow_cost_series(df, leverage: float, spread: float):
    """Vectorized daily borrow cost from an IRX column (percent units)."""
    import pandas as pd

    borrowed = leverage - 1.0
    if borrowed <= 0:
        return pd.Series(0.0, index=df.index)
    risk_free = df["IRX"] / 100.0
    return borrowed * (risk_free + spread) / 252.0


def get_max_underwater_days(equity_curve) -> int:
    """Longest run of days below the running high-water mark."""
    ec = np.asarray(equity_curve, dtype=float)
    if ec.size == 0:
        return 0
    hwm = np.maximum.accumulate(ec)
    under = ec < hwm
    best = run = 0
    for u in under:
        run = run + 1 if u else 0
        best = max(best, run)
    return int(best)


def fill_missing_with_dynamic_factor(df, target_col: str, factor_col: str,
                                     default_beta: float, seed: int = 1234):
    """Backfill missing returns with an overlap-calibrated rolling beta plus
    resampled residuals (host-side data prep, one-time)."""
    import pandas as pd

    if target_col not in df.columns:
        df[target_col] = np.nan
    target = df[target_col].copy()
    factor = df[factor_col].copy()

    valid = target.notna() & factor.notna()
    if valid.sum() < 40:
        return target.fillna(default_beta * factor)

    cov = target.rolling(252, min_periods=40).cov(factor)
    var = factor.rolling(252, min_periods=40).var()
    beta = (cov / var.replace(0, np.nan)).replace([np.inf, -np.inf], np.nan)
    beta = beta.clip(-3.0, 3.0).ffill().bfill().fillna(default_beta)

    alpha = (target - beta * factor).rolling(252, min_periods=40).mean()
    alpha = alpha.ffill().bfill().fillna(0.0)

    fitted = alpha + beta * factor
    residuals = (target - fitted)[valid].dropna().values
    missing = target.isna() & factor.notna()

    if len(residuals) > 20 and missing.any():
        rng = np.random.default_rng(seed)
        sampled = rng.choice(residuals, size=int(missing.sum()), replace=True)
        target.loc[missing] = fitted.loc[missing].values + sampled
    else:
        target.loc[missing] = fitted.loc[missing]
    return target

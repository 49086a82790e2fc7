"""Data layer: historical market data acquisition and reconstruction.

Parity surface (letf/data.py:11-630):
- Fama-French (1926-1949) + market-data (1950+) splice at the cutoff date
- dynamic-factor backfill of missing NASDAQ/QQQ/TLT history
- VIX approximation from rolling vol pre-1990; IRX from RF/term structure
- synthetic pre-inception LETF reconstruction with correct geometric
  compounding, dynamic borrow cost, and multiplicative AR(1) tracking
  error; real post-inception data overrides; ``*_IsSynthetic`` flags
- technical indicators (SMA200, EWMA vol) and date-range trimming

Offline-first: network loaders (pandas_datareader Fama-French, yfinance)
are gated on import/network availability. Without them, a deterministic
synthetic market history with the same schema and statistical structure is
generated (clearly flagged ``Data_Source='synthetic-offline'``) so that
calibration, validation, and historical comparison run end-to-end anywhere.
This is host-side, one-time I/O — device arrays are built downstream.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from letf_tpu import config as cfg
from letf_tpu.utils import (
    fill_missing_with_dynamic_factor,
    get_borrow_cost_series,
    load_cache,
    save_cache,
)

try:
    import yfinance as yf                       # noqa: F401
    _YFINANCE = True
except ImportError:
    _YFINANCE = False

try:
    import pandas_datareader.data as web        # noqa: F401
    _DATAREADER = True
except ImportError:
    _DATAREADER = False


# ---------------------------------------------------------------------------
# Network loaders (gated)
# ---------------------------------------------------------------------------

def fetch_fama_french_data(start_date: str, end_date: str) -> Optional[pd.DataFrame]:
    """Daily market returns from the Fama-French library (1926+): market
    return = Mkt-RF + RF; IRX proxied from annualized RF; synthetic VIX from
    20d rolling vol; NASDAQ ~ 1.25x SPY; TLT ~ -0.25x SPY + carry."""
    if not _DATAREADER:
        return None
    try:
        ff = web.DataReader("F-F_Research_Data_Factors_daily", "famafrench",
                            start=start_date, end=end_date)[0]
    except Exception as e:  # noqa: BLE001 - network failures degrade gracefully
        print(f"  [WARN] Fama-French fetch failed: {e}")
        return None

    out = pd.DataFrame(index=ff.index)
    out["SPY_Ret"] = (ff["Mkt-RF"] + ff["RF"]) / 100.0
    out["RF"] = ff["RF"] / 100.0
    out["IRX"] = ff["RF"] * 252.0
    out["SPY_Price"] = (1 + out["SPY_Ret"]).cumprod() * 100
    out["NASDAQ_Ret"] = out["SPY_Ret"] * 1.25
    out["QQQ_Ret"] = out["NASDAQ_Ret"]
    rolling_vol = out["SPY_Ret"].rolling(20).std() * np.sqrt(252) * 100
    out["VIX"] = rolling_vol.fillna(20.0)
    out["TLT_Ret"] = out["SPY_Ret"] * -0.25 + out["RF"]
    out["Data_Source"] = "Fama-French"
    return out


def fetch_market_data(start_date: str, end_date: str) -> Optional[pd.DataFrame]:
    """1950+ market data via yfinance: indices, VIX, rates, TLT, QQQ, and
    real LETF prices (TQQQ/UPRO/SSO) for post-inception truth."""
    if not _YFINANCE:
        return None
    tickers = ["^GSPC", "^IXIC", "^VIX", "^IRX", "^TNX", "TLT", "QQQ",
               "TQQQ", "UPRO", "SSO"]
    try:
        data = yf.download(tickers, start=start_date, end=end_date,
                           progress=False, auto_adjust=True)
    except Exception as e:  # noqa: BLE001
        print(f"  [WARN] market data fetch failed: {e}")
        return None

    close = data["Close"]
    df = pd.DataFrame(index=close.index)
    if "^GSPC" in close:
        df["SPY_Price"] = close["^GSPC"]
        df["SPY_Ret"] = df["SPY_Price"].pct_change()
    if "^IXIC" in close:
        df["NASDAQ_Price"] = close["^IXIC"]
        df["NASDAQ_Ret"] = df["NASDAQ_Price"].pct_change()
    if "QQQ" in close:
        df["QQQ_Price"] = close["QQQ"]
        df["QQQ_Ret"] = df["QQQ_Price"].pct_change()
    for etf in ("TQQQ", "UPRO", "SSO"):
        if etf in close:
            df[f"{etf}_Real_Price"] = close[etf]
            df[f"{etf}_Real_Ret"] = df[f"{etf}_Real_Price"].pct_change()
    if "^VIX" in close:
        df["VIX"] = close["^VIX"]
    if "SPY_Ret" in df:
        vol = df["SPY_Ret"].rolling(20).std() * np.sqrt(252) * 100
        df["VIX"] = df.get("VIX", pd.Series(index=df.index)).fillna(vol).fillna(20.0)
    if "^IRX" in close:
        df["IRX"] = close["^IRX"]
    df["IRX"] = df.get("IRX", pd.Series(4.5, index=df.index)).fillna(4.5)
    if "^TNX" in close:
        df["TNX"] = close["^TNX"]
    df["Cash_Ret"] = df["IRX"] / 100 / 252
    if "TLT" in close:
        df["TLT_Price"] = close["TLT"]
        df["TLT_Ret"] = df["TLT_Price"].pct_change()
    df["Data_Source"] = "yfinance"
    return df


# ---------------------------------------------------------------------------
# Offline synthetic history (deterministic)
# ---------------------------------------------------------------------------

def generate_synthetic_history(start_date: str = cfg.DATA_START_DATE,
                               end_date: str = cfg.DATA_END_DATE,
                               seed: int = 20260816) -> pd.DataFrame:
    """Deterministic ~100y daily market history with the reference schema.

    A 2-state regime chain drives SPY/QQQ/TLT returns (regime-dependent
    vol + correlation), a mean-reverting VIX coupled to equity shocks, and
    slow-moving IRX/TNX rates. Post-inception ``*_Real_*`` LETF columns are
    built from the true daily-rebalance relation (L*r - ER/252 - borrow)
    plus small AR(1) noise, so calibration has realistic targets. Clearly
    labeled synthetic — used when network data sources are unavailable.
    """
    rng = np.random.default_rng(seed)
    dates = pd.bdate_range(start_date, end_date)
    n = len(dates)

    # Regime chain: ~85% calm / 15% stressed.
    p_enter, p_exit = 0.012, 0.075
    regime = np.zeros(n, np.int8)
    r = 0
    for t in range(n):
        u = rng.random()
        r = (1 if u < p_enter else 0) if r == 0 else (0 if u < p_exit else 1)
        regime[t] = r

    mu = np.where(regime == 0, 0.00045, -0.0006)
    sig = np.where(regime == 0, 0.0085, 0.022)
    z = rng.standard_t(6, size=(n, 3))
    rho_eq = np.where(regime == 0, 0.85, 0.95)
    rho_b = np.where(regime == 0, -0.2, -0.05)
    spy = mu + sig * z[:, 0]
    qqq = mu * 1.15 + sig * 1.32 * (rho_eq * z[:, 0]
                                    + np.sqrt(1 - rho_eq ** 2) * z[:, 1])
    tlt = 0.00015 + 0.006 * (rho_b * z[:, 0] + np.sqrt(1 - rho_b ** 2) * z[:, 2])

    vix = np.empty(n)
    vix[0] = 16.0
    for t in range(1, n):
        target = 15.0 if regime[t] == 0 else 33.0
        shock = max(-spy[t], 0.0) / max(sig[t], 1e-4)
        jump = 7.0 * max(0.0, shock - 2.0)
        vix[t] = max(9.0, 0.92 * vix[t - 1] + 0.08 * target + jump
                     + rng.normal(0, 1.1))

    irx = np.empty(n)
    irx[0] = 4.0
    for t in range(1, n):
        target = 4.2 if regime[t] == 0 else 1.8
        irx[t] = np.clip(0.999 * irx[t - 1] + 0.001 * target
                         + rng.normal(0, 0.02), 0.0, 15.0)
    tnx = np.clip(irx + np.where(vix > 30, -0.25, 1.1)
                  + rng.normal(0, 0.05, n), 0.0, 18.0)

    df = pd.DataFrame({
        "SPY_Ret": spy, "QQQ_Ret": qqq, "NASDAQ_Ret": qqq, "TLT_Ret": tlt,
        "VIX": vix, "IRX": irx, "TNX": tnx,
    }, index=dates)
    df["RF"] = df["IRX"] / 100 / 252
    df["Cash_Ret"] = df["RF"]
    df["SPY_Price"] = (1 + df["SPY_Ret"]).cumprod() * 100
    df["QQQ_Price"] = (1 + df["QQQ_Ret"]).cumprod() * 100
    df["NASDAQ_Price"] = df["QQQ_Price"]
    df["TLT_Price"] = (1 + df["TLT_Ret"]).cumprod() * 100

    # Real post-inception LETF columns from the true daily relation.
    for asset in ("TQQQ", "UPRO", "SSO"):
        ac = cfg.ASSETS[asset]
        inception = pd.Timestamp(ac.inception)
        mask = df.index >= inception
        under = df["QQQ_Ret"] if asset == "TQQQ" else df["SPY_Ret"]
        borrow = ((ac.leverage - 1.0)
                  * np.maximum(df["IRX"] / 100.0 + ac.borrow_spread, 0) / 252.0)
        te = np.zeros(n)
        tdraws = rng.standard_t(5, n) * ac.tracking_error_base
        for t in range(1, n):
            te[t] = 0.25 * te[t - 1] + tdraws[t]
        real = (ac.leverage * under - ac.expense_ratio / 252.0 - borrow + te)
        real = real.where(mask)
        df[f"{asset}_Real_Ret"] = real
        price = (1 + real.fillna(0)).where(mask).cumprod() * 100
        df[f"{asset}_Real_Price"] = price.where(mask)

    df["Data_Source"] = "synthetic-offline"
    return df


# ---------------------------------------------------------------------------
# Splice + reconstruction
# ---------------------------------------------------------------------------

def combine_data_sources(ff_data: pd.DataFrame, market_data: pd.DataFrame,
                         cutoff_date: str = cfg.YFINANCE_START_DATE) -> pd.DataFrame:
    """Fama-French before the cutoff, market data after; continuous SPY
    price; duplicate dates prefer the later source."""
    cutoff = pd.to_datetime(cutoff_date)
    before = ff_data[ff_data.index < cutoff].copy()
    after = market_data[market_data.index >= cutoff].copy()
    for col in after.columns:
        if col not in before.columns:
            before[col] = np.nan
    combined = pd.concat([before, after]).sort_index()
    combined = combined[~combined.index.duplicated(keep="last")]
    if "SPY_Ret" in combined.columns:
        combined["SPY_Price"] = (1 + combined["SPY_Ret"].fillna(0)).cumprod() * 100
    return combined


def reconstruct_letf_columns(df: pd.DataFrame) -> pd.DataFrame:
    """Synthetic LETF series for every asset with correct vol-drag
    compounding (drag emerges from geometric compounding of
    L*r - expense/252 - dynamic borrow, NOT a per-day subtraction), plus
    multiplicative AR(1) fat-tailed tracking error; real post-inception data
    overrides; ``_IsSynthetic`` flags mark reconstruction
    (data.py:439-551 semantics)."""
    from scipy.stats import t as student_t

    n = len(df)
    for asset_id, ac in cfg.ASSETS.items():
        if ac.underlying == cfg.UNDERLYING_QQQ:
            underlying = df["QQQ_Ret"]
        elif ac.underlying == cfg.UNDERLYING_TLT:
            underlying = df["TLT_Ret"]
        else:
            underlying = df["SPY_Ret"]
        beta = ac.beta_to_spy
        if beta != 1.0 and asset_id not in ("TMF", "TQQQ"):
            underlying = underlying * beta

        daily_expense = ac.expense_ratio / 252.0
        borrow = get_borrow_cost_series(df, ac.leverage, ac.borrow_spread)
        net_before_te = ac.leverage * underlying - daily_expense - borrow

        # Display-only synthetic TE (fixed seed; nothing downstream
        # calibrates on these columns).
        te_rng = np.random.default_rng(42 + ord(asset_id[0]))
        vix_mult = (df["VIX"] / 20.0) ** 1.5
        u_np = underlying.to_numpy()
        te = np.zeros(n)
        for i in range(1, n):
            innovation = (student_t.rvs(df=ac.tracking_error_df,
                                        random_state=te_rng)
                          * ac.tracking_error_base * vix_mult.iloc[i])
            if not np.isnan(u_np[i]):
                innovation *= 1 + 10 * abs(u_np[i])
            te[i] = 0.3 * te[i - 1] + innovation

        synthetic = (1 + net_before_te) * (1 + te) - 1
        df[f"{asset_id}_Ret"] = synthetic
        df[f"{asset_id}_Price"] = (1 + synthetic.fillna(0)).cumprod() * 100

        inception = pd.to_datetime(ac.inception)
        rp, rr = f"{asset_id}_Real_Price", f"{asset_id}_Real_Ret"
        if rp in df.columns and rr in df.columns:
            real_mask = (df.index >= inception) & df[rp].notna()
            if real_mask.any():
                df.loc[real_mask, f"{asset_id}_Ret"] = df.loc[real_mask, rr]
                pre_mask = ~real_mask
                if pre_mask.any():
                    pre_prices = (1 + df.loc[pre_mask, f"{asset_id}_Ret"]
                                  .fillna(0)).cumprod()
                    first_real = df.loc[real_mask, rp].iloc[0]
                    scale = first_real / pre_prices.iloc[-1]
                    df.loc[pre_mask, f"{asset_id}_Price"] = pre_prices * scale
                df.loc[real_mask, f"{asset_id}_Price"] = df.loc[real_mask, rp]
            df[f"{asset_id}_IsSynthetic"] = ~real_mask
        else:
            df[f"{asset_id}_IsSynthetic"] = df.index < inception
    return df


def fetch_historical_data(force_synthetic: bool = False) -> pd.DataFrame:
    """Full data pipeline with caching: fetch (or synthesize) -> splice ->
    backfill -> reconstruct LETFs -> indicators -> trim to analysis range."""
    cached = load_cache(cfg.DATA_CACHE)
    if cached is not None:
        print("[OK] Using cached historical data")
        return cached

    print(f"\n{'=' * 80}")
    print("FETCHING HISTORICAL DATA")
    print(f"{'=' * 80}")

    df = None
    if not force_synthetic:
        ff = fetch_fama_french_data(cfg.DATA_START_DATE, cfg.FAMA_FRENCH_END_DATE)
        mkt = fetch_market_data(cfg.YFINANCE_START_DATE, cfg.DATA_END_DATE)
        if ff is not None and mkt is not None and len(mkt) > 0:
            df = combine_data_sources(ff, mkt)
        elif mkt is not None and len(mkt) > 0:
            df = mkt
        elif ff is not None:
            df = ff
    if df is None or "SPY_Ret" not in df.columns or df["SPY_Ret"].isna().all():
        print("  [INFO] Network data unavailable - generating deterministic "
              "SYNTHETIC market history (offline mode)")
        df = generate_synthetic_history()

    # Backfills (dynamic factor models; reference data.py:360-414).
    if "NASDAQ_Ret" not in df.columns:
        df["NASDAQ_Ret"] = np.nan
    if df["NASDAQ_Ret"].isna().any():
        df["NASDAQ_Ret"] = fill_missing_with_dynamic_factor(
            df, "NASDAQ_Ret", "SPY_Ret", default_beta=1.25, seed=1101)
    if "QQQ_Ret" not in df.columns:
        df["QQQ_Ret"] = np.nan
    if df["QQQ_Ret"].isna().any():
        df["QQQ_Ret"] = fill_missing_with_dynamic_factor(
            df, "QQQ_Ret", "NASDAQ_Ret", default_beta=1.0, seed=1102)
    if "VIX" not in df.columns:
        df["VIX"] = np.nan
    if df["VIX"].isna().any():
        vol = df["SPY_Ret"].rolling(20).std() * np.sqrt(252) * 100
        df["VIX"] = df["VIX"].fillna(vol).fillna(20.0)
    if "IRX" not in df.columns:
        df["IRX"] = np.nan
    if df["IRX"].isna().any():
        if "RF" in df.columns:
            df["IRX"] = df["IRX"].fillna(df["RF"] * 252 * 100)
        if "TNX" in df.columns:
            df["IRX"] = df["IRX"].fillna((0.55 * df["TNX"]).clip(lower=0.0))
        df["IRX"] = df["IRX"].interpolate(limit_direction="both").ffill().fillna(3.0)
    if "Cash_Ret" not in df.columns:
        df["Cash_Ret"] = df["IRX"] / 100 / 252
    if "TLT_Ret" not in df.columns:
        df["TLT_Ret"] = np.nan
    if df["TLT_Ret"].isna().any():
        filled = fill_missing_with_dynamic_factor(
            df, "TLT_Ret", "SPY_Ret", default_beta=-0.20, seed=1103)
        df["TLT_Ret"] = filled.fillna(df["IRX"] / 100 / 252)

    df = reconstruct_letf_columns(df)

    # Indicators (data.py:552-571).
    df["SMA200"] = df["SPY_Price"].rolling(200, min_periods=1).mean()
    df["Market_Vol_EWMA"] = (df["SPY_Ret"].ewm(span=20, adjust=False).std()
                             * np.sqrt(252))
    df["Market_Vol_20d"] = df["SPY_Ret"].rolling(20).std() * np.sqrt(252)
    df["Market_Vol"] = df["Market_Vol_EWMA"]

    df = df.loc[cfg.ANALYSIS_START_DATE:cfg.ANALYSIS_END_DATE].copy()
    df.dropna(subset=["SPY_Ret", "VIX"], inplace=True)

    print(f"[OK] Data ready: {len(df):,} trading days "
          f"({len(df) / 252:.1f} years), source="
          f"{df['Data_Source'].iloc[-1] if 'Data_Source' in df else 'unknown'}")
    for asset_id in ("TQQQ", "UPRO", "SSO"):
        col = f"{asset_id}_IsSynthetic"
        if col in df.columns:
            n_syn = int(df[col].sum())
            print(f"  {asset_id}: {len(df) - n_syn:,} real days, "
                  f"{n_syn:,} SYNTHETIC days")
    print("  WARNING: pre-inception LETF data is SYNTHETIC reconstruction.")

    cfg.init_cache()
    save_cache(df, cfg.DATA_CACHE)
    return df

